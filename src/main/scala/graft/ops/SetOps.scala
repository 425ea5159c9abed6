package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Set-operation queries (SURVEY.md §2B "Set operations").
  *
  * "High-value" = o_totalprice > 300000; "recent" = orderdate in/after 2001.
  * UNION ALL keeps duplicates (orders in both sets appear twice); the final
  * total ORDER BY over every column makes duplicate adjacency deterministic.
  */
object SetOps {

  private def high(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def recent(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01")))
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val highSql =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000"
  private val recentSql =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'"

  val all: Seq[QDef] = Seq(
    QDef(
      "q_set_union_all",
      s"""SELECT * FROM ($highSql UNION ALL $recentSql) t
         |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin) { (s, d) =>
      high(s, d).unionByName(recent(s, d))
        .orderBy("o_orderkey", "o_custkey", "o_totalprice")
    },

    QDef(
      "q_set_union_distinct",
      s"""SELECT * FROM ($highSql UNION $recentSql) t
         |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin) { (s, d) =>
      high(s, d).unionByName(recent(s, d)).distinct()
        .orderBy("o_orderkey", "o_custkey", "o_totalprice")
    },

    QDef(
      "q_set_intersect",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  INTERSECT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING') t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).orderBy("custkey")
    },

    QDef(
      "q_set_except",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  EXCEPT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING') t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.except(b).orderBy("custkey")
    },

    // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep MULTIPLICITY
    // (a custkey with 3 qualifying orders and 1 customer row survives EXCEPT
    // ALL twice) — a different operator from the distinct forms above, and
    // the one dedup-accounting pipelines actually need. Spark plans both as
    // an aggregate of signed counts (no quadratic anti-join per duplicate).
    QDef(
      "q_set_except_all",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  EXCEPT ALL
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING') t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.exceptAll(b).orderBy("custkey")
    },

    QDef(
      "q_set_intersect_all",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      val b = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      a.intersectAll(b).orderBy("custkey")
    },
  )
}
