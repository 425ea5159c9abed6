package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function queries (SURVEY.md §2B "Window functions").
  *
  * Moving/running sums use exact DECIMAL accumulation then a double division,
  * so sliding-frame implementations (segment trees vs. re-scan) can't produce
  * last-ulp drift between engines. Every window order includes a unique
  * tie-breaker so frames are deterministic.
  */
object Windows {

  val all: Seq[QDef] = Seq(
    QDef(
      "q_win_rank",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"), rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("o_custkey", "rn")
    },

    QDef(
      "q_win_topk_per_group",
      """SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t
        |WHERE rk <= 3
        |ORDER BY p_brand, rk, p_partkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.part(s, d)
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
        .orderBy("p_brand", "rk", "p_partkey")
    },

    // Same grouped top-3, but as a bounded TypedImperativeAggregate
    // (graft.functions.TopKPairs) instead of window-rank: the window plan
    // shuffles every row and sorts whole partitions; the aggregate keeps an
    // O(k) heap per group, combines map-side, and ships only k pairs per
    // group — the plan a 100 TB grouped top-k needs. Same rank rule
    // (score DESC, id ASC), so the window oracle checks it row-for-row.
    QDef(
      "q_win_topk_agg_native",
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, p_retailprice DESC, p_partkey""".stripMargin) { (s, d) =>
      graft.functions.TopKFunctions.registerOn(s)
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(expr("topk_pairs(p_retailprice, p_partkey, 3)").as("tk"))
        .select(col("p_brand"), explode(col("tk")).as("t"))
        .select(col("p_brand"), col("t.id").as("p_partkey"),
          col("t.score").as("p_retailprice"))
        .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
    },

    QDef(
      "q_win_lag_lead",
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value) OVER w AS prev_value, lead(value) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    },

    QDef(
      "q_win_moving_avg",
      """SELECT event_id, user_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(value) OVER w AS mavg5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          (sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            / count(col("value")).over(w)).as("mavg5"))
        .orderBy("user_id", "event_id")
    },

    QDef(
      "q_win_range_frame",
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_rev"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    // Distribution functions: percent_rank/cume_dist are integer-ratio
    // doubles (identical across engines regardless of tie order).
    QDef(
      "q_win_distribution",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    },

    QDef(
      "q_win_ntile_first_last",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_orderkey) OVER w2 AS best_order,
        |  last_value(o_orderkey) OVER w2 AS worst_order
        |FROM orders
        |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
        |       w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          first(col("o_orderkey")).over(w2).as("best_order"),
          last(col("o_orderkey")).over(w2).as("worst_order"))
        .orderBy(col("o_custkey").asc, col("o_totalprice").desc, col("o_orderkey").asc)
    },
  )
}
