package graft.ops

import graft.{QDef, Tables, X}
import org.apache.spark.sql.functions._

/** Aggregation queries (SURVEY.md §2B "Aggregations"; reference anchor:
  * batch `COUNT(*)` over a streaming table, tutorial/guide.md:51-56, :88-96).
  *
  * All double-column sums go through exact DECIMAL accumulation (see [[graft.X]])
  * so results are independent of partial-aggregation order — both the DuckDB
  * hash-compare and a 1000-executor run produce identical bits. Spark plans all
  * of these as partial (map-side) + final hash aggregates automatically.
  */
object Aggs {

  private val sumQtyDec = "SUM(CAST(l_quantity AS DECIMAL(18,2)))"

  val all: Seq[QDef] = Seq(
    QDef(
      "q_agg_global",
      s"""SELECT count(*) AS n_rows,
         |  CAST($sumQtyDec AS DOUBLE) AS sum_qty,
         |  CAST($sumQtyDec AS DOUBLE) / count(l_quantity) AS avg_qty,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        X.dsum(col("l_quantity")).as("sum_qty"),
        X.davg(col("l_quantity")).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        X.dsum(col("l_extendedprice")).as("sum_price"))
    },

    // TPC-H Q1 shape — the canonical hash group-by with map-side combine.
    QDef(
      "q_agg_groupby_hash",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST($sumQtyDec AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
         |  CAST($sumQtyDec AS DOUBLE) / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          X.dsum(col("l_quantity")).as("sum_qty"),
          X.dsum(col("l_extendedprice")).as("sum_base_price"),
          X.dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    QDef(
      "q_agg_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // HLL sketch — approximate by design, so no SQL oracle; AggSpec asserts
    // the estimate is within 5% of the exact distinct count.
    QDef.noOracle("q_agg_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_nd_parts"))
        .orderBy("l_returnflag")
    },

    QDef(
      "q_agg_rollup",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      // Expressed in SQL: Spark's ambiguous-self-join check misfires on
      // rollup() over a 4-table join chain (same result plan either way).
      s.sql(
        s"""SELECT r_name, n_name,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |  count(*) AS n_orders
           |FROM parquet.`$d/region.parquet` r
           |JOIN parquet.`$d/nation.parquet` n ON n_regionkey = r_regionkey
           |JOIN parquet.`$d/customer.parquet` c ON c_nationkey = n_nationkey
           |JOIN parquet.`$d/orders.parquet` o ON o_custkey = c_custkey
           |GROUP BY ROLLUP (r_name, n_name)
           |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },

    QDef(
      "q_agg_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), X.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    QDef(
      "q_agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      s.sql(
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  count(*) AS n
           |FROM parquet.`$d/lineitem.parquet`
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // Quantile sketch (approx by design, like the HLL row above): no SQL
    // oracle; AggSpec asserts the sketch lands within 1 of the exact median
    // and inside the exact p10/p90 envelope.
    QDef.noOracle("q_agg_percentile_approx") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("p90"))
        .orderBy("l_returnflag")
    },

    // Order statistics: exact median (both engines average the two middle
    // values on even counts — same double op, so bit-identical).
    QDef(
      "q_agg_median",
      """SELECT l_returnflag, median(l_quantity) AS med_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("med_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Deterministic correlation at scale: built-in corr() accumulates doubles
    // in partial-agg order (nondeterministic bits), so compute it from EXACT
    // decimal power sums instead — the distributed-safe way to get stable
    // second-order statistics.
    QDef(
      "q_agg_corr_exact",
      """WITH s AS (SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * sxy - sx * sy) /
        |        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
        |  n
        |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // The power sums run as SHARDED LONG-CENTS partials instead of
      // DECIMAL(28,4) accumulation: each 4-decimal product is recovered to
      // integer 10⁻⁴-units with rint (exact — see graft.X), then split as
      // hi·10⁹ + lo so TWO long sums extend the exact range from 2^53 cents
      // (~9e4 rows of 1e14-cent products) to ~9e9 rows — whole-stage-codegen
      // long adds with map-side partials, no per-row BigDecimal. The exact
      // integer total is reassembled in DECIMAL and cast to double ONCE, so
      // the result is bit-identical to the oracle's CAST(SUM(DECIMAL(28,4))
      // AS DOUBLE). sx/sy shard the same way at scale 2 — plain dsum's
      // 2^53-cents bound would bind first (~9e8 rows/group) otherwise.
      // (name, value expression, decimal scale of the exact units): first
      // moments are 2-decimal, products 4-decimal. ALL five sums shard, so
      // the whole query carries one exactness bound (~9e9 rows/group from
      // the lo-sum), not dsum's tighter 2^53-cents bound on sx/sy.
      val sums5 = Seq(
        ("sx", "l_quantity", 2), ("sy", "l_extendedprice", 2),
        ("sxy", "l_quantity * l_extendedprice", 4),
        ("sxx", "l_quantity * l_quantity", 4),
        ("syy", "l_extendedprice * l_extendedprice", 4))
      val shardAggs = sums5.flatMap { case (nm, p, sc) =>
        val cents = s"cast(rint(($p) * 1e$sc) as bigint)"
        Seq(sum(expr(s"$cents div 1000000000")).as(s"${nm}_hi"),
            sum(expr(s"$cents % 1000000000")).as(s"${nm}_lo"))
      }
      // value = (10⁹·Σhi + Σlo)/10^sc = Σhi·10^(9-sc) + Σlo·10^(-sc),
      // assembled exactly in decimal (both terms hold the integer units
      // exactly), then one double rounding — the same single rounding the
      // oracle's CAST(SUM(DECIMAL) AS DOUBLE) performs
      def assemble(nm: String, sc: Int) =
        (col(s"${nm}_hi").cast(s"decimal(38,$sc)") *
           lit(math.pow(10, 9 - sc).toLong) +
         col(s"${nm}_lo").cast(s"decimal(38,$sc)") *
           lit(java.math.BigDecimal.ONE.movePointLeft(sc)))
          .cast("double").as(nm)
      val aggCols = count(lit(1)).as("n") +: shardAggs
      val sums = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(aggCols.head, aggCols.tail: _*)
        .select(col("l_returnflag") +: col("n") +:
          sums5.map { case (nm, _, sc) => assemble(nm, sc) }: _*)
      sums.select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"),
          col("n"))
        .orderBy("l_returnflag")
    },

    // Skew-handling pattern: events has only 5 event_type values, so at
    // 100 TB a single-phase groupBy funnels ~20% of the table into one
    // reducer. Salt the hot key into 16 sub-keys, partially aggregate, then
    // finalize — two small shuffles instead of one skewed one. Decimal-exact
    // partials make the result bit-identical to the unsalted plan (= oracle).
    QDef(
      "q_agg_skew_salted",
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(sum(col("value").cast("decimal(18,2)")).as("ps"), count(lit(1)).as("pc"))
        .groupBy("event_type")
        .agg(sum(col("ps")).cast("double").as("sum_value"), sum(col("pc")).as("n"))
        .orderBy("event_type")
    },

    QDef(
      "q_agg_having",
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_partkey
        |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 800
        |ORDER BY l_partkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq_dec"),
          count(lit(1)).as("n"))
        .filter(col("sq_dec") > 800)
        .select(col("l_partkey"), col("sq_dec").cast("double").as("sum_qty"), col("n"))
        .orderBy("l_partkey")
    },

    // Deterministic mode (most frequent value) per group: built-in mode()
    // has undefined tie-breaks on BOTH engines, so the rule is explicit —
    // highest count, then smallest value — via a map-side-combining argmax
    // over the (group, value) counts.
    QDef(
      "q_agg_mode",
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_quantity AS qty_mode, cnt AS n FROM (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity) AS rn
        |  FROM c) t
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max_by(
          struct(col("l_quantity").as("qty_mode"), col("cnt").as("n")),
          struct(col("cnt"), (-col("l_quantity")).as("nq"))).as("m"))
        .select(col("l_returnflag"), col("m.qty_mode").as("qty_mode"),
          col("m.n").as("n"))
        .orderBy("l_returnflag")
    },

    // Pivot: per-user value totals spread across event-type columns. Spark's
    // pivot compiles to exactly the CASE-per-value aggregation the oracle
    // spells out — one pass, partial-agg friendly (no crosstab operator
    // needed at any scale).
    QDef(
      "q_agg_pivot",
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .orderBy("user_id")
    },

    // Unpivot (melt): wide numeric columns to (metric, val) rows — the
    // normalization step before generic per-metric aggregation. The oracle is
    // the UNION ALL expansion unpivot desugars to.
    QDef(
      "q_agg_unpivot",
      """SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_discount"), col("l_extendedprice"), col("l_quantity")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")
    },

    // Ordered string aggregation (LISTAGG/string_agg — the SQL:2016 surface):
    // per-priority key roster as ONE deterministic string. Ordering inside an
    // aggregate is the trap — Spark's collect_list order is partition-
    // dependent, so the contract is sort-then-join (sort_array before
    // array_join), which commutes with any partial-agg order. Filtered first
    // so the group payloads stay bounded (an unfiltered LISTAGG over a fact
    // table is an anti-pattern at any scale — the string IS the data).
    QDef(
      "q_agg_string_agg",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys
        |FROM orders WHERE o_totalprice > 350000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_totalprice") > 350000)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("array_join(transform(sort_array(collect_list(o_orderkey)), " +
            "x -> CAST(x AS STRING)), ',')").as("keys"))
        .orderBy("o_orderpriority")
    },

    // Argmax aggregation (max_by/min_by — SQL:2023's ANY_VALUE cousin that
    // pipelines actually use: "the row that attains the extreme"). Ties are
    // the correctness trap: max_by picks an ARBITRARY attaining row, so the
    // ordering value packs the tie-break INTO the comparand — exact cents
    // scaled past the key range plus the key itself. One partial-aggregated
    // shuffle; the packed long is 8 bytes of state per group.
    QDef(
      "q_agg_minmax_by",
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey) AS key_of_max,
        |  arg_min(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000 + o_orderkey) AS key_of_min
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val packed = (X.cents(col("o_totalprice")) * 10000000L + col("o_orderkey"))
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(max_by(col("o_orderkey"), packed).as("key_of_max"),
          min_by(col("o_orderkey"), packed).as("key_of_min"))
        .orderBy("o_orderpriority")
    },

    // Filtered aggregation (the FILTER clause / count_if): several
    // differently-predicated aggregates in ONE pass over the fact table —
    // the alternative (one scan per predicate, union'd) multiplies I/O by
    // the predicate count. All predicates evaluate map-side; state per
    // group stays one long per aggregate.
    QDef(
      "q_agg_filtered",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 45) AS n_bulk,
        |  count(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count_if(col("l_quantity") > 45).as("n_bulk"),
          count_if(col("l_discount") >= 0.05).as("n_discounted"),
          sum(when(col("l_tax") > 0.04, col("l_extendedprice").cast("decimal(18,2)")))
            .cast("double").as("taxed_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Boolean aggregation (bool_and/bool_or = SQL EVERY/ANY): per-group
    // invariant checks as a single byte of aggregation state — the shape
    // data-quality assertions compile to (e.g. "every order in the group
    // has a positive price"), instead of count-compare round trips.
    QDef(
      "q_agg_bool",
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_above_1k,
        |  bool_or(o_totalprice > 400000) AS any_jumbo,
        |  bool_and(o_custkey IS NOT NULL) AS all_keyed
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_above_1k"),
          bool_or(col("o_totalprice") > 400000).as("any_jumbo"),
          bool_and(col("o_custkey").isNotNull).as("all_keyed"))
        .orderBy("o_orderpriority")
    },

    // Distinct-set aggregation. collect_set's order is partition-dependent,
    // so the deterministic contract is sort_array on top — and the array is
    // RENDERED AS A STRING via array_join, because the driver's pandas
    // comparator cannot sort raw array cells (the same rule every
    // array-valued query in Funcs.scala follows). The distinct-combine
    // happens in the partial aggregate, so the shuffle carries per-group
    // distinct sets, never raw rows.
    QDef(
      "q_agg_collect_set",
      """SELECT c_mktsegment,
        |  array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
        |  count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(array_join(sort_array(collect_set(col("c_nationkey"))), ",").as("nations"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy("c_mktsegment")
    },
  )
}
