package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream–dimension lookup join with retry-on-miss — the full semantics of
  * the reference's LOOKUP hint (`/root/reference/tutorial/guide.md:122-138`:
  * `'retry-predicate'='lookup_miss'`, fixed-delay capped retries,
  * `'output-mode'='allow_unordered'`).
  *
  * Per micro-batch: the new rows PLUS the previous batch's unmatched rows
  * join against the CURRENT dimension snapshot (the provider re-reads it
  * every batch = processing-time temporal semantics, 2A#9). Matches append
  * to `outDir/data` (unordered across retries, as the reference allows);
  * misses park in a versioned retry file with an attempt counter; rows whose
  * attempts exceed `maxAttempts` land in `outDir/dead` (the analog of the
  * reference's 50-attempt cap). The retry delay is the trigger interval —
  * the reference's fixed 1 s delay maps to the micro-batch cadence.
  *
  * At scale this is the planner-free pattern: no custom operator, one
  * broadcast join per batch, retry state is a small parquet file keyed by
  * batch id. Replay-safe end to end: every write of batch `id` (matches,
  * pending, dead letters) is an overwrite of a batch-`id`-keyed path, and
  * pending GC always keeps the newest predecessor, so a batch replayed
  * after a crash rewrites exactly its own outputs from exactly its inputs.
  * Read the sink with `option("recursiveFileLookup", true)` (per-batch
  * subdirectories).
  */
object LookupRetry {

  def start(
      spark: SparkSession,
      stream: DataFrame,
      dim: () => DataFrame,
      key: String,
      outDir: String,
      maxAttempts: Int,
      trigger: Trigger): StreamingQuery = {
    val retryDir = s"$outDir/retry"
    Files.createDirectories(Paths.get(retryDir))
    // A fresh checkpoint restarts batch ids at 0, so pending-N files left by
    // a previous run (checkpoint deleted, outDir kept) would first be skipped
    // (N >= id) and later consumed by batch N+1 as if they were this run's
    // parked rows. Detect the fresh start (no committed offsets) and clear
    // the stale pending state before the query begins.
    val offsetsDir = Paths.get(s"$outDir/chk/offsets")
    if (!Files.isDirectory(offsetsDir) ||
        graft.table.StreamTable.listDir(offsetsDir).isEmpty)
      graft.table.StreamTable.listDir(Paths.get(retryDir))
        .filter(_.getFileName.toString.startsWith("pending-"))
        .foreach(graft.table.StreamTable.deleteTree)

    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        // newest pending file from an EARLIER batch (replay-safe)
        val pending = graft.table.StreamTable.listDir(Paths.get(retryDir)).iterator
          .map(_.getFileName.toString)
          .filter(_.startsWith("pending-"))
          .map(_.stripPrefix("pending-").toLong)
          .filter(_ < id).toSeq.sorted.lastOption
          .map(m => s.read.parquet(s"$retryDir/pending-$m"))
        val fresh = batch.withColumn("__attempts", lit(0))
        val input = pending.map(fresh.unionByName(_)).getOrElse(fresh)

        val d = dim().withColumn("__hit", lit(1))
        val joined = input.join(broadcast(d), Seq(key), "left").cache()
        try {
          // per-batch output dirs + overwrite ⇒ a replayed batch rewrites its
          // own files instead of double-appending (exactly-once sink)
          joined.filter(col("__hit").isNotNull)
            .drop("__hit", "__attempts")
            .write.mode("overwrite").parquet(s"$outDir/data/batch-$id")
          val missed = joined.filter(col("__hit").isNull)
            .select(input.columns.map(col): _*)
            .withColumn("__attempts", col("__attempts") + 1)
          missed.filter(col("__attempts") < maxAttempts)
            .write.mode("overwrite").parquet(s"$retryDir/pending-$id")
          missed.filter(col("__attempts") >= maxAttempts)
            .drop("__attempts")
            .write.mode("overwrite").parquet(s"$outDir/dead/batch-$id")
        } finally joined.unpersist()
        // GC superseded pending files, but KEEP the newest predecessor: a
        // replay of this batch (crash before the checkpoint commit) must be
        // able to re-read the pending state it consumed
        val preds = graft.table.StreamTable.listDir(Paths.get(retryDir))
          .filter(_.getFileName.toString.startsWith("pending-"))
          .sortBy(_.getFileName.toString.stripPrefix("pending-").toLong)
          .filter(_.getFileName.toString.stripPrefix("pending-").toLong < id)
        preds.dropRight(1).foreach(p => graft.table.StreamTable.deleteTree(p))
      }
      .option("checkpointLocation", s"$outDir/chk")
      .trigger(trigger)
      .start()
  }
}
