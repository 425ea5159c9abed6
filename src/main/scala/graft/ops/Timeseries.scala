package graft.ops

import graft.{QDef, Tables, X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time analytics over the `events` stream table (round 4 of the
  * north-star family): batch sessionization, funnel attribution, time-bucket
  * resampling with gap-fill, and statistical anomaly detection. These are the
  * batch duals of the streaming surface (graft.streaming.StreamOps) — e.g.
  * [[q_ext_sessionize]] computes the same 30-minute-gap sessions as
  * `q_stream_session`'s session_window, via the classic lag/cumsum idiom —
  * re-expressing the reference's stream–batch duality theme
  * (/root/reference/tutorial/guide.md:51-56) on the analytics side.
  *
  * Scale rules: every shuffle is keyed on `user_id`/`event_type`/bucket (never
  * wide payloads); windows are partitioned by user or by a time-bounded grid;
  * the only broadcast sides are provably bounded (per-type stats, 1-row
  * bounds). Exact-cents arithmetic keeps every double bit-identical to the
  * DuckDB oracle (graft.X rationale).
  */
object Timeseries {

  val all: Seq[QDef] = Seq(
    // Batch sessionization: per-user 30-min-gap sessions via the lag/cumsum
    // idiom. The window is PARTITIONED BY user_id — state per task is one
    // user's events, never the corpus; at 100 TB this is one shuffle on
    // user_id plus a per-user sort, the same cost profile as any windowed
    // per-entity pass. Gap arithmetic is integer microseconds (exact).
    QDef(
      "q_ext_sessionize",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id FROM events),
        |f AS (SELECT user_id, t, event_id,
        |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
        |              OR epoch_us(t) - epoch_us(lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)) > 1800000000
        |             THEN 1 ELSE 0 END AS flag
        |      FROM e),
        |g AS (SELECT user_id, t,
        |        CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
        |      FROM f)
        |SELECT user_id, sess_idx, count(*) AS n_events, min(t) AS session_start,
        |  max(t) AS session_end,
        |  CAST(epoch_us(max(t)) - epoch_us(min(t)) AS BIGINT) AS duration_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, sess_idx""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"))
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(ord)
      // session TZ is UTC, so the ntz→ltz cast is the identity instant
      val gapUs = unix_micros(col("ts").cast("timestamp")) -
        unix_micros(prev.cast("timestamp"))
      e.withColumn("flag", when(prev.isNull || gapUs > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess_idx", sum("flag")
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_idx")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"), max("ts").as("session_end"))
        .withColumn("duration_us",
          unix_micros(col("session_end").cast("timestamp")) -
            unix_micros(col("session_start").cast("timestamp")))
        .orderBy("user_id", "sess_idx")
    },

    // Funnel attribution: first view → first click at-or-after that view →
    // first purchase at-or-after that click, per user. Three stage-filtered
    // min-aggregates chained by user_id equi-joins — every join is keyed on
    // user_id (shuffle-local after the first), no window state, no
    // event-ordering shuffle; the stage tables shrink monotonically.
    QDef(
      "q_ext_funnel",
      """WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_view
        |      FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS first_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.first_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS first_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.first_click GROUP BY 1)
        |SELECT u.user_id, v.first_view, c.first_click, p.first_purchase
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("first_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") >= col("first_view"))
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") >= col("first_click"))
        .groupBy("user_id").agg(min("ts").as("first_purchase"))
      e.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .orderBy("user_id")
    },

    // Time-bucket resample with gap-fill: hourly (bucket, event_type) counts
    // and exact sums, densified over the full hour grid (missing buckets →
    // 0), plus a forward-fill marker (last bucket with data). The grid is
    // |hours| × |types| — time-bounded, NOT corpus-proportional, so the
    // per-type ordered window over the grid is safe at any data scale; the
    // corpus-sized work is one groupBy on (bucket, type).
    QDef(
      "q_ext_resample",
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type, value FROM events),
        |a AS (SELECT h, event_type, count(*) AS n,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |      FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |hours AS (SELECT unnest(range(h0, h1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS h FROM b),
        |grid AS (SELECT h, event_type FROM hours, (SELECT DISTINCT event_type FROM e) t)
        |SELECT g.h, g.event_type, CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
        |  coalesce(a.sv, 0.0) AS sum_value,
        |  max(CASE WHEN a.n IS NOT NULL THEN g.h END)
        |    OVER (PARTITION BY g.event_type ORDER BY g.h ROWS UNBOUNDED PRECEDING) AS last_seen_h
        |FROM grid g LEFT JOIN a ON g.h = a.h AND g.event_type = a.event_type
        |ORDER BY g.h, g.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"),
          col("event_type"), col("value"))
      val agg = e.groupBy("h", "event_type")
        .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("sv"))
      // bounds and the type list derive from the grid-bounded agg frame —
      // the events table is scanned exactly once
      val bounds = agg.agg(min("h").as("h0"), max("h").as("h1"))
      val hours = bounds.select(explode(
        sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val types = agg.select("event_type").distinct()
      val ffill = Window.partitionBy("event_type").orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hours.crossJoin(types)
        .join(agg, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("sum_value"),
          max(when(col("n").isNotNull, col("h"))).over(ffill).as("last_seen_h"))
        .orderBy("h", "event_type")
    },

    // Per-type z-score anomaly detection: flag events > 2.5σ from their
    // type's mean. Moments are exact long cents / cents² partial-aggregated
    // map-side (codegen long adds). Bit-exactness bound: Σc² stays ≤ 2^53
    // only up to ~3.7e6 rows PER TYPE of ~500-unit values (c² ≈ 2.4e9 each)
    // — beyond that the long→double conversion adds a second rounding, so
    // shard the squared sum hi/lo like q_agg_corr_exact (long overflow
    // itself is ~100× further out); the per-type
    // stats frame is bounded by |event_type| so it BROADCASTS back. Both
    // engines then evaluate the identical FP tree — mean = sv/n,
    // var = sv2/n − mean², z = (x − mean)/√var — so the 2.5σ cut and the
    // 6-dp-rounded z are bit-identical.
    QDef(
      "q_ext_anomaly_zscore",
      """WITH s AS (SELECT event_type, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv2
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |  round((value - sv / CAST(n AS DOUBLE)) / sqrt(sv2 / CAST(n AS DOUBLE) - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE))), 6) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE abs((value - sv / CAST(n AS DOUBLE)) / sqrt(sv2 / CAST(n AS DOUBLE) - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE)))) > 2.5
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val c = X.cents(col("value"))
      val st = e.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(c).as("sc"), sum(c * c).as("sc2"))
      val nD = col("n").cast("double")
      val mean = (col("sc") / 100.0) / nD
      val z = (col("value") - mean) / sqrt((col("sc2") / 10000.0) / nD - mean * mean)
      e.join(broadcast(st), Seq("event_type"))
        .filter(abs(z) > 2.5)
        .select(col("event_id"), col("event_type"), col("value"),
          round(z, 6).as("z"))
        .orderBy("event_id")
    },

    // Cohort retention: users grouped by first-active day, counted on each
    // later active day. Two user-keyed aggregations + one user-keyed join;
    // the (cohort, offset) matrix is date-bounded (days²), never
    // user-proportional. DuckDB's date_trunc('day') yields DATE, so both
    // sides work in DATE + integer day offsets — no timestamp arithmetic.
    QDef(
      "q_ext_cohort_retention",
      """WITH f AS (SELECT user_id, date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS cohort_day FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events)
        |SELECT f.cohort_day, CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val f = e.groupBy("user_id").agg(to_date(min("ts")).as("cohort_day"))
      val a = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      a.join(f, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Winsorization: clip each type's values at the exact p05/p95 ORDER
    // STATISTICS (value at rank ⌈q·n⌉ — discrete selection, so the bounds
    // are actual data values and the clipped sum stays exact-cents). The
    // rank pass is one per-type sort — the inherent cost of exact order
    // statistics; at extreme scale swap in approx_percentile and keep the
    // same clip/aggregate tail. Bounds frame is |event_type|-bounded →
    // broadcast back.
    QDef(
      "q_ext_winsorize",
      """WITH st AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |rk AS (SELECT event_id, event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
        |       FROM events),
        |b AS (SELECT rk.event_type,
        |        min(CASE WHEN rn = (5 * n + 99) // 100 THEN value END) AS lo,
        |        min(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS hi
        |      FROM rk JOIN st ON rk.event_type = st.event_type
        |      WHERE rn = (5 * n + 99) // 100 OR rn = (95 * n + 99) // 100
        |      GROUP BY 1)
        |SELECT e.event_type, b.lo, b.hi,
        |  CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(SUM(CAST(CASE WHEN e.value < b.lo THEN b.lo WHEN e.value > b.hi THEN b.hi ELSE e.value END AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS wins_mean
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type, b.lo, b.hi ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val st = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      val rk = e.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))))
      // ⌈q·n⌉ in PURE INTEGER arithmetic. DuckDB types 0.05 as exact
      // DECIMAL while Spark multiplies doubles; for THIS pair of quantiles
      // no divergence was ever observed (IEEE rounding lands back on the
      // integer for q=0.05/0.95 at every n up to 1e8), but the same
      // decimal-vs-double ceil provably diverges in the 0.1-decile family
      // (q_ext_length_deciles, first at d=3, n=10) — integer rank
      // arithmetic removes the hazard class instead of relying on luck
      val k05 = expr("(5 * n + 99) div 100")
      val k95 = expr("(95 * n + 99) div 100")
      val bounds = rk.join(broadcast(st), Seq("event_type"))
        .filter(col("rn") === k05 || col("rn") === k95)
        .groupBy("event_type")
        .agg(min(when(col("rn") === k05, col("value"))).as("lo"),
          min(when(col("rn") === k95, col("value"))).as("hi"))
      val clip = when(col("value") < col("lo"), col("lo"))
        .when(col("value") > col("hi"), col("hi")).otherwise(col("value"))
      e.join(broadcast(bounds), Seq("event_type"))
        .groupBy("event_type", "lo", "hi")
        .agg(
          sum(when(col("value") < col("lo"), 1).otherwise(0)).cast("long").as("n_below"),
          sum(when(col("value") > col("hi"), 1).otherwise(0)).cast("long").as("n_above"),
          (X.dsum(clip) / count(lit(1)).cast("double")).as("wins_mean"))
        .orderBy("event_type")
    },

    // Equi-width histogram (25-unit buckets) with exact-cents bucket
    // assignment: the boundary test happens on recovered integer cents, so
    // no value can straddle a bucket edge through FP noise. Map-only +
    // one bucket-keyed groupBy with map-side partials.
    QDef(
      "q_ext_histogram",
      """WITH h AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 2500 AS bucket, value FROM events)
        |SELECT bucket, count(*) AS n, min(value) AS lo, max(value) AS hi,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(expr("cast(rint(value * 100) as long) div 2500").as("bucket"))
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"),
          X.dsum(col("value")).as("sum_value"))
        .orderBy("bucket")
    },

    // Time-weighted average — each event's value held until the user's next
    // event (the step-function integral sensor/metric pipelines need, where
    // the plain mean over-weights bursts). The integrand is EXACT: cents ×
    // gap-µs products sum as longs (map-side combined), one double division
    // pair at the end — identical FP both engines. Overflow bound: per-user
    // Σ(Δµs)·max_cents ≤ observation-window-µs × max_cents — a 30-day
    // window of ≤10^4-unit values is ~2.6e12·1e6 = 2.6e18 < 2^63; shard
    // the product sum past that (the X.dsum rationale). One user-keyed
    // window pass + one user-keyed aggregation; a single-event user's only
    // row has a NULL gap, so the IS-NOT-NULL filter drops them on both
    // engines identically.
    QDef(
      "q_ext_time_weighted",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |g AS (SELECT user_id, c,
        |        lead(epoch_us(t)) OVER (PARTITION BY user_id ORDER BY t, event_id) - epoch_us(t) AS d_us
        |      FROM e)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(SUM(d_us) AS BIGINT) AS total_us,
        |  CAST(SUM(c * d_us) AS DOUBLE) / CAST(SUM(d_us) AS DOUBLE) / 100.0 AS twa
        |FROM g WHERE d_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val us = unix_micros(col("ts").cast("timestamp"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          X.cents(col("value")).as("c"))
        .withColumn("d_us", lead(us, 1).over(w) - us)
        .filter(col("d_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"), sum("d_us").as("total_us"),
          sum(col("c") * col("d_us")).as("swc"))
        .select(col("user_id"), col("n_intervals"), col("total_us"),
          (col("swc").cast("double") / col("total_us").cast("double") /
            lit(100.0)).as("twa"))
        .orderBy("user_id")
    },

    // Slowly-changing-dimension (Type 2) enrichment: each customer's order
    // history becomes a versioned dimension (valid_from = o_orderdate,
    // valid_to = next version's start via lead()), and every event joins the
    // version that was CURRENT at its timestamp — the batch dual of the
    // reference's `FOR SYSTEM_TIME AS OF` lookup join (tutorial/guide.md:139)
    // when the dimension keeps history instead of being overwritten.
    // Complements q_join_asof: as-of returns the latest row ≤ ts; SCD2
    // models explicit validity intervals, so an event BEFORE the first
    // version correctly matches nothing (inner join drops it).
    //
    // 100 TB posture: the version build is one user-keyed window; the join
    // is an equi-hash on the user key with the interval predicate as a
    // residual (the q_join_interval shape) — linear shuffle, no pair blowup
    // because a key's versions partition time (≤1 match per event).
    QDef(
      "q_ext_scd2_enrich",
      """WITH ver AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  v.o_orderkey AS version_key, v.valid_from,
        |  v.o_totalprice AS version_price
        |FROM events e JOIN ver v ON e.user_id = v.o_custkey
        |  AND CAST(e.ts AS TIMESTAMP) >= v.valid_from
        |  AND (v.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < v.valid_to)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val vw = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val ver = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp_ntz").as("valid_from"),
        lead(col("o_orderdate").cast("timestamp_ntz"), 1).over(vw).as("valid_to"))
      Tables.events(s, d)
        .join(ver, col("user_id") === col("o_custkey") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("version_key"), col("valid_from"),
          col("o_totalprice").as("version_price"))
        .orderBy("event_id")
    },
  )
}
