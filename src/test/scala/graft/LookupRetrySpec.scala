package graft

import java.nio.file.Files

import graft.streaming.LookupRetry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Retry-on-miss lookup join (the reference's LOOKUP hint semantics,
  * guide.md:122-138): rows whose dimension key is missing are retried on
  * later micro-batches against the CURRENT dim, and matched out of order. */
class LookupRetrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("missed lookups retry against the updated dim; exhausted rows dead-letter") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_lr_src_").toString
    val outDir = Files.createTempDirectory("graft_lr_out_").toString

    // the dim is re-read per batch — a mutable reference simulates a PK
    // table receiving upserts between checkpoints
    @volatile var dimRows = Seq((1L, "one"))
    def dim(): DataFrame = dimRows.toDF("k", "name")

    val schema = Seq((0L, "")).toDF("k", "payload").schema
    def runOnce(): Unit = {
      val q = LookupRetry.start(spark,
        spark.readStream.schema(schema).parquet(srcDir),
        dim _, "k", outDir, maxAttempts = 3, Trigger.AvailableNow())
      q.awaitTermination()
    }

    // batch 1: keys 1 (hit) and 2 (miss → parked)
    Seq((1L, "p1"), (2L, "p2")).toDF("k", "payload")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val afterB1 = spark.read.option("recursiveFileLookup", "true").parquet(s"$outDir/data")
    assert(afterB1.count() == 1 && afterB1.select("k").first().getLong(0) == 1L)

    // dim gains key 2; batch 2 brings key 3 — the parked row 2 now matches
    dimRows = Seq((1L, "one"), (2L, "two"), (3L, "three"))
    Seq((3L, "p3")).toDF("k", "payload").write.mode("append").parquet(srcDir)
    runOnce()
    val afterB2 = spark.read.option("recursiveFileLookup", "true").parquet(s"$outDir/data")
    assert(afterB2.select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // a key that never resolves exhausts its attempts into the dead letter
    Seq((99L, "p99")).toDF("k", "payload").write.mode("append").parquet(srcDir)
    runOnce() // attempt 1
    for (_ <- 1 to 3) {
      // empty batches still fire with AvailableNow? no — push a hit row to
      // drive another batch each time
      Seq((1L, "tick")).toDF("k", "payload").write.mode("append").parquet(srcDir)
      runOnce()
    }
    assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$outDir/dead").select("k").first().getLong(0) == 99L)
    assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$outDir/data").filter($"k" === 99L).count() == 0)
  }

  test("a fresh checkpoint clears stale pending files from a previous run") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_lr2_src_").toString
    val outDir = Files.createTempDirectory("graft_lr2_out_").toString

    // a previous run (whose checkpoint was deleted) left parked rows behind;
    // without the fresh-start sweep, batch ids restarting at 0 would first
    // skip pending-5 and then batch 6 would consume it as this run's state
    Seq((77L, "stale", 1)).toDF("k", "payload", "__attempts")
      .write.parquet(s"$outDir/retry/pending-5")

    def dim(): org.apache.spark.sql.DataFrame = Seq((1L, "one")).toDF("k", "name")
    val schema = Seq((0L, "")).toDF("k", "payload").schema
    Seq((1L, "p1")).toDF("k", "payload").write.mode("append").parquet(srcDir)
    val q = LookupRetry.start(spark,
      spark.readStream.schema(schema).parquet(srcDir),
      dim _, "k", outDir, maxAttempts = 3, Trigger.AvailableNow())
    q.awaitTermination()

    assert(!Files.exists(java.nio.file.Paths.get(s"$outDir/retry/pending-5")),
      "stale pending state from the dead run is gone")
    val data = spark.read.option("recursiveFileLookup", "true").parquet(s"$outDir/data")
    assert(data.select("k").collect().map(_.getLong(0)).toSeq == Seq(1L),
      "only this run's rows are in the output")
  }
}
