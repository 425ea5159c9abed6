package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics that the DuckDB oracle can't express. */
class StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("late data behind the watermark is dropped from the aggregation") {
    val rows = SparkEntry.queries("q_stream_late_data")(spark, SparkFixture.sf)
      .collect()
      .map(r => r.get(0).toString.substring(11, 16) -> r.getLong(1))
      .toMap
    // batch 1 emits [00:00,00:10)={min1,min5} and [00:10,00:20)={min12};
    // batch 2's min4 row is behind the 00:25 watermark → DROPPED (not 3);
    // min22 lands in the open [00:20,00:30) window; min35 closes later.
    assert(rows("00:00") == 2L, s"late row was not dropped: $rows")
    assert(rows("00:10") == 1L)
    assert(rows("00:20") == 1L)
    assert(rows("00:30") == 1L)
  }

  test("stream-stream left outer: null rows appear exactly for watermark-closed windows") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_stream_stream_left_join")(spark, SparkFixture.sf)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong)))
    val nullRows = rows.filter(_._2.isEmpty).map(_._1).toSet
    assert(nullRows.nonEmpty, "some unmatched left rows must have emitted")
    // the matched subset equals the INNER stream-stream join exactly
    val inner = SparkEntry.queries("q_stream_stream_join")(spark, SparkFixture.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.filter(_._2.isDefined).map(t => (t._1, t._2.get)).toSet == inner)
    // null-emitted rows are genuinely matchless in the batch interval join,
    // and their join window closed strictly below the final watermark
    val e = Tables.events(spark, SparkFixture.sf)
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    val maxTs = e.map(_._3).max
    val matchable = inner.map(_._1)
    for (id <- nullRows.take(50)) {
      assert(!matchable.contains(id), s"$id emitted null but has a match")
      val ts = e.find(_._1 == id).get._3
      assert(ts.plusHours(2).isBefore(maxTs), s"$id window not closed by watermark")
    }
  }

  test("stream-stream full outer ⊇ left outer; adds only right-null rows") {
    val full = SparkEntry.queries("q_stream_stream_full_join")(spark, SparkFixture.sf)
      .collect().map(r => (Option(r.get(0)).map(_.toString.toLong),
        Option(r.get(1)).map(_.toString.toLong)))
    val left = SparkEntry.queries("q_stream_stream_left_join")(spark, SparkFixture.sf)
      .collect().map(r => (Option(r.get(0)).map(_.toString.toLong),
        Option(r.get(1)).map(_.toString.toLong)))
    assert(left.toSet subsetOf full.toSet)
    val extra = full.toSet -- left.toSet
    assert(extra.nonEmpty && extra.forall(_._1.isEmpty),
      "full outer adds exactly the right-side null emissions")
  }

  test("stream-batch duality: streaming tumbling agg == batch equivalent") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("q_stream_tumbling")(spark, SparkFixture.sf)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    val batch = Tables.events(spark, SparkFixture.sf)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("ws", "event_type")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("incremental backlog walk: ≥4 rate-limited batches, state carries across") {
    import org.apache.spark.sql.functions._
    val (df, nBatches) =
      graft.streaming.StreamOps.incrementalCounts(spark, SparkFixture.sf)
    assert(nBatches >= 4, s"8 files at 2/trigger must take ≥4 batches, got $nBatches")
    val streamed = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = Tables.events(spark, SparkFixture.sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), X.dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq == batch.toSeq)
  }
}
