package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time analytics family (graft.ops.Timeseries) + the round-4 Curation
  * additions. The DuckDB oracle pins value parity; these tests pin the
  * semantic PROPERTIES a hash match alone would not explain. */
class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sessionize: same session inventory as the streaming session_window") {
    // stream–batch duality: the lag/cumsum sessionization must produce the
    // exact same (user, start, n) session set as q_stream_session's
    // session_window (whose end is start-of-last + gap, so compare starts)
    val batch = run("q_ext_sessionize").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("session_start"),
        r.getLong(2))).toSet
    val stream = run("q_stream_session").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("session_start"),
        r.getLong(3))).toSet
    assert(batch == stream)
  }

  test("sessionize: sessions are gap-consistent") {
    val rows = run("q_ext_sessionize").collect()
    val byUser = rows.groupBy(_.getLong(0))
    for ((_, ss) <- byUser) {
      val sorted = ss.sortBy(_.getLong(1))
      // indices are 1..k dense per user
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // consecutive sessions are separated by MORE than the 30 min gap
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1) {
        val aEnd = a.getAs[java.time.LocalDateTime]("session_end")
        val bStart = b.getAs[java.time.LocalDateTime]("session_start")
        assert(java.time.Duration.between(aEnd, bStart).toMillis > 30 * 60 * 1000L)
      }
    }
  }

  test("funnel: stage timestamps are ordered and stage counts shrink") {
    val rows = run("q_ext_funnel").collect()
    var (nv, nc, np) = (0, 0, 0)
    for (r <- rows) {
      val v = Option(r.getAs[java.time.LocalDateTime]("first_view"))
      val c = Option(r.getAs[java.time.LocalDateTime]("first_click"))
      val p = Option(r.getAs[java.time.LocalDateTime]("first_purchase"))
      // a later stage implies the earlier one, at-or-after it
      if (c.isDefined) { assert(v.isDefined && !c.get.isBefore(v.get)) }
      if (p.isDefined) { assert(c.isDefined && !p.get.isBefore(c.get)) }
      nv += v.size; nc += c.size; np += p.size
    }
    assert(nv >= nc && nc >= np && np > 0)
  }

  test("resample: dense grid, conserved counts, ffill marker is last data bucket") {
    val rows = run("q_ext_resample").collect()
    val types = rows.map(_.getString(1)).distinct
    val hours = rows.map(_.getAs[java.time.LocalDateTime]("h")).distinct
    assert(rows.length == types.length * hours.length, "grid must be dense")
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sf).count())
    for (t <- types) {
      var lastSeen: java.time.LocalDateTime = null
      for (r <- rows.filter(_.getString(1) == t)
          .sortBy(_.getAs[java.time.LocalDateTime]("h"))) {
        if (r.getLong(2) > 0) lastSeen = r.getAs[java.time.LocalDateTime]("h")
        assert(r.getAs[java.time.LocalDateTime]("last_seen_h") == lastSeen)
        if (r.getLong(2) == 0) assert(r.getDouble(3) == 0.0)
      }
    }
  }

  test("anomaly zscore: every flagged event is beyond 2.5 sigma of its type") {
    val rows = run("q_ext_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(math.abs(r.getDouble(3)) > 2.49999, r.toString)
    // spot-check against independently computed population stats
    val stats = Tables.events(spark, sf).groupBy("event_type")
      .agg(avg("value").as("m"), stddev_pop("value").as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (r <- rows) {
      val (m, s) = stats(r.getString(1))
      assert(math.abs((r.getDouble(2) - m) / s) > 2.4) // loose: fp path differs
    }
  }

  test("tfidf: top-3 per doc, scores non-increasing, terms occur in the doc") {
    val rows = run("q_ext_tfidf").collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    for ((_, gs) <- rows.groupBy(_.getLong(0))) {
      val byRn = gs.sortBy(_.getLong(1))
      assert(byRn.map(_.getLong(1)).toSeq == (1L to byRn.length).toSeq)
      assert(byRn.length <= 3)
      for (Array(a, b) <- byRn.sliding(2).map(_.toArray) if byRn.length > 1)
        assert(a.getDouble(3) >= b.getDouble(3))
    }
    for (r <- rows) assert(texts(r.getLong(0)).contains(r.getString(2)))
  }

  test("zipf: ranks dense, freqs non-increasing, cum_share ends at head share sum") {
    val rows = run("q_ext_zipf").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    for (Array(a, b) <- rows.sliding(2).map(_.toArray))
      assert(a.getLong(2) >= b.getLong(2) && a.getDouble(4) <= b.getDouble(4))
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(rows.last.getDouble(4) - shareSum) < 1e-4)
  }

  test("importance sample: acceptance replays the md5 threshold rule exactly") {
    val accepted = run("q_ext_importance_sample").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
    var longAcc = 0; var longTot = 0; var shortAcc = 0; var shortTot = 0
    for (r <- docs) {
      val (id, nc) = (r.getLong(0), r.getLong(1))
      val w16 = math.min(math.min(nc, 400L) * 65536 / 400, 65535L)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val expectAccept = md < f"$w16%04x"
      assert(accepted.contains(id) == expectAccept, s"doc $id")
      if (expectAccept) assert(accepted(id) == w16)
      if (nc >= 400) { longTot += 1; if (expectAccept) longAcc += 1 }
      else { shortTot += 1; if (expectAccept) shortAcc += 1 }
    }
    // weighting must bite: full-weight docs accept at ~1.0, short ones lower
    assert(longAcc.toDouble / longTot > shortAcc.toDouble / math.max(shortTot, 1))
  }

  test("cohort retention: offset-0 row equals the cohort size") {
    val rows = run("q_ext_cohort_retention").collect()
    val cohortSize = Tables.events(spark, sf)
      .groupBy("user_id").agg(to_date(min("ts")).as("c"))
      .groupBy("c").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    for (r <- rows if r.getLong(1) == 0L)
      assert(r.getLong(2) == cohortSize(r.getDate(0).toString))
    // every (user, active-day) pair is counted exactly once
    val total = rows.map(_.getLong(2)).sum
    val userDays = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(total == userDays)
  }

  test("winsorize: bounds are data values, tail counts ~5%, mean inside bounds") {
    val rows = run("q_ext_winsorize").collect()
    val values = Tables.events(spark, sf).select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getDouble(1)) }
    for (r <- rows) {
      val (t, lo, hi) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val vs = values(t)
      assert(lo < hi && vs.contains(lo) && vs.contains(hi))
      assert(r.getLong(3) <= math.ceil(0.05 * vs.length).toLong)
      assert(r.getLong(4) <= vs.length - math.floor(0.95 * vs.length).toLong + 1)
      assert(r.getDouble(5) >= lo && r.getDouble(5) <= hi)
    }
  }

  test("histogram: buckets partition the data, bounds inside bucket edges") {
    val rows = run("q_ext_histogram").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    for (r <- rows) {
      val b = r.getLong(0)
      assert(r.getDouble(2) >= b * 25.0 - 0.005 && r.getDouble(3) < (b + 1) * 25.0 + 0.005)
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("cdc apply: deleted keys vanish, survivors carry their last op's value") {
    val got = run("q_stream_cdc_apply").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val last = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1).collect()
    for (r <- last) {
      val (u, id, tpe, v) = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value"))
      if (tpe == "error") assert(!got.contains(u), s"user $u had a trailing -D")
      else assert(got(u) == (id, v), s"user $u")
    }
  }

  test("tpch q10 shape: 20 rows, revenue strictly ordered, returned items only") {
    val rows = run("q_tpch_q10_shape").collect()
    assert(rows.length == 20)
    for (Array(a, b) <- rows.sliding(2).map(_.toArray))
      assert(a.getDouble(3) > b.getDouble(3) ||
        (a.getDouble(3) == b.getDouble(3) && a.getLong(0) < b.getLong(0)))
  }

  test("time-weighted avg: matches a hand-rolled exact step integral per user") {
    val rows = run("q_ext_time_weighted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val byUser = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime]("ts"), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for ((u, evs) <- byUser) {
      val s = evs.sortBy(e => (e._2, e._3))
      val us = s.map(e =>
        e._2.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          e._2.getNano / 1000L)
      val cents = s.map(e => math.rint(e._4 * 100).toLong)
      if (s.length < 2) assert(!rows.contains(u), s"single-event user $u kept")
      else {
        val gaps = us.zip(us.tail).map { case (a, b) => b - a }
        val tot = gaps.sum
        val swc = gaps.zip(cents).map { case (g, c) => g * c }.sum
        val (nInt, totalUs, twa) = rows(u)
        assert(nInt == gaps.length && totalUs == tot, s"user $u intervals")
        assert(twa == swc.toDouble / tot.toDouble / 100.0, s"user $u twa")
      }
    }
  }
}
