package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Scan / filter / projection / top-k / complex-predicate queries
  * (SURVEY.md §2B "Sources/sinks & scan-level"; reference scan+LIMIT:
  * Readme.md:112,160, tutorial/guide.md:147).
  *
  * All filters and projections are plain Catalyst expressions so predicate
  * pushdown + column pruning reach the parquet scan (verified in PlanSpec).
  */
object Scans {

  val all: Seq[QDef] = Seq(
    QDef(
      "q_scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin) { (s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem, so
      // the ORDER BY covers every output column to stay total.
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    QDef(
      "q_limit_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    },

    QDef(
      "q_pred_complex",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND (o_totalprice BETWEEN 50000 AND 200000 OR o_orderpriority LIKE '1-%')
        |  AND NOT (o_orderpriority LIKE '%NOT%')
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderstatus").isin("F", "P") &&
          (col("o_totalprice").between(50000, 200000) || col("o_orderpriority").like("1-%")) &&
          !col("o_orderpriority").like("%NOT%") &&
          col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },
  )
}
