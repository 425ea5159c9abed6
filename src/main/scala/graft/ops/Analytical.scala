package graft.ops

import graft.{QDef, Tables, X}
import org.apache.spark.sql.functions._

/** Composed analytical queries (TPC-H Q3/Q5 shapes): multi-way joins +
  * filtered aggregation + top-k — the plans a warehouse engine must get right
  * end-to-end. Catalyst handles join ordering; dims (region/nation/customer/
  * supplier) broadcast under the threshold, lineitem↔orders shuffles on the
  * key; AQE re-plans at runtime. Revenue goes through exact DECIMAL so the
  * top-k order is engine-independent.
  */
object Analytical {

  private val revenue =
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE)"

  val all: Seq[QDef] = Seq(
    // Q3 shape: shipping-priority revenue of BUILDING-segment orders.
    QDef(
      "q_tpch_q3_shape",
      s"""SELECT l_orderkey, $revenue AS revenue, o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |  AND l_shipdate > TIMESTAMP '1999-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp_ntz(lit("1999-01-01")))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp_ntz(lit("1999-01-01")))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,4)")).cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(20)
    },

    // Q5 shape: local-supplier revenue per nation inside one region.
    QDef(
      "q_tpch_q5_shape",
      s"""SELECT n_name, $revenue AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d); val c = Tables.customer(s, d)
      val o = Tables.orders(s, d); val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      r.join(n, n("n_regionkey") === r("r_regionkey"))
        .join(c, c("c_nationkey") === n("n_nationkey"))
        .join(o, o("o_custkey") === c("c_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .join(su, su("s_suppkey") === li("l_suppkey") &&
          su("s_nationkey") === c("c_nationkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // Q10 shape: top returned-item revenue per customer. lineitem is
    // pre-filtered on the return flag BEFORE the join (the only
    // corpus-sized input); nation broadcasts; orders↔lineitem shuffles on
    // the order key; the final top-20 is a distributed TakeOrdered.
    QDef(
      "q_tpch_q10_shape",
      s"""SELECT c_custkey, c_name, n_name, $revenue AS revenue
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d); val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(o, o("o_custkey") === c("c_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(24,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q18 shape: large-volume orders (HAVING over an exact quantity sum).
    // The HAVING evaluates on exact integer cents (identical to the
    // oracle's DECIMAL comparison), so the qualifying-order set can never
    // differ by an ulp; the big-order frame shrinks drastically before the
    // joins, which AQE then broadcasts.
    QDef(
      "q_tpch_q18_shape",
      """WITH big AS (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |             FROM lineitem GROUP BY 1
        |             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(X.cents(col("l_quantity"))).as("qc"))
        .filter(col("qc") > 15000L)
        .select(col("l_orderkey"), (col("qc") / 100.0).as("total_qty"))
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      big.join(o, o("o_orderkey") === big("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    },

    // Q1 shape: the full pricing summary (8 aggregates incl. the
    // disc-price and charge decimal products and three exact averages) —
    // the canonical scan→partial-agg→4-group-final plan. 2-decimal sums go
    // through long cents (X.dsum, codegen long adds); the 4- and 6-decimal
    // products sum as exact DECIMAL like Q3/Q5's revenue (both engines
    // compute the identical IEEE double product, round it to the same
    // decimal once, and sum exactly); averages divide the exact sum by the
    // group count as the single double rounding.
    QDef(
      "q_tpch_q1_shape",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-08-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val n = count(lit(1))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp_ntz(lit("2001-08-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          X.dsum(col("l_quantity")).as("sum_qty"),
          X.dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(24,4)")).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
               (lit(1) + col("l_tax")))
            .cast("decimal(30,6)")).cast("double").as("sum_charge"),
          (X.dsum(col("l_quantity")) / n).as("avg_qty"),
          (X.dsum(col("l_extendedprice")) / n).as("avg_price"),
          (X.dsum(col("l_discount")) / n).as("avg_disc"),
          n.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q6 shape: forecast-revenue-change — three range predicates that all
    // push into the parquet scan (PushedFilters on shipdate/discount/
    // quantity prune row groups before any row materializes; at 100 TB the
    // scan is the whole query) followed by one global exact product sum.
    QDef(
      "q_tpch_q6_shape",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1999-01-01")) &&
          col("l_shipdate") < to_timestamp_ntz(lit("2000-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(24,4)")).cast("double").as("revenue"))
    },
  )
}
