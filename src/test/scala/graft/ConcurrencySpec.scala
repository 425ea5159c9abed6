package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.table.StreamTable
import org.scalatest.funsuite.AnyFunSuite

/** The hardest invariant (SURVEY.md §7): exactly-once commits under a
  * CONCURRENT streaming writer and compactor. The manifest's atomic-rename +
  * optimistic-retry commit must never lose an append or double-count rows,
  * regardless of interleaving. */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("concurrent appender + compactor: no lost rows, consistent manifests") {
    val t = new StreamTable(Files.createTempDirectory("graft_conc_").toString, spark)
    val nBatches = 12
    val rowsPerBatch = 50
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    @volatile var writerErr: Throwable = null
    @volatile var compactorErr: Throwable = null

    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try {
          for (b <- 0 until nBatches) {
            val df = spark.range(b * rowsPerBatch, (b + 1) * rowsPerBatch).toDF("id")
            t.appendBatch(df, b.toLong)
          }
        } catch { case e: Throwable => writerErr = e }
      }
    })
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try {
          for (_ <- 0 until 5) {
            Thread.sleep(150)
            t.compact(targetFileCount = 2)
          }
        } catch { case e: Throwable => compactorErr = e }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "threads did not finish")
    assert(writerErr == null, s"writer failed: $writerErr")
    assert(compactorErr == null, s"compactor failed: $compactorErr")

    // every appended row present exactly once, under any interleaving
    val got = t.read.orderBy("id").collect().map(_.getLong(0))
    assert(got.length == nBatches * rowsPerBatch,
      s"expected ${nBatches * rowsPerBatch} rows, got ${got.length}")
    assert(got.toSeq == (0L until (nBatches * rowsPerBatch).toLong))
    // snapshot ids are a contiguous sequence (no torn commits)
    val ids = t.snapshots.map(_.id)
    assert(ids == (ids.min to ids.max))
  }
}
