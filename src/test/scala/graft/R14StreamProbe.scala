package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe for round-14: where does a streaming query's wall time go?
  * Replicates q_stream_dedup / q_stream_tumbling / a stream-stream join
  * shape inline (same session shape as the bench) and prints every batch's
  * durationMs breakdown from recentProgress. Test scope, not a surface. */
object R14StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // warmup batch machinery
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().collect()

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$d/events.parquet").schema
    val srcDir = {
      val dir = Files.createTempDirectory("r14_probe_src_")
      Files.createSymbolicLink(dir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      dir.toString
    }
    def ev() = {
      val raw = spark.readStream.schema(schema).parquet(srcDir)
      raw.withColumn("ts", col("ts").cast("timestamp"))
    }

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def drain(label: String, df: org.apache.spark.sql.DataFrame, mode: String): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val name = "probe_" + label.replaceAll("[^a-zA-Z0-9]", "")
        val q = t(s"$label start+drain") {
          val q = df.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination(); q
        }
        for (p <- q.recentProgress)
          println(s"[probe]   batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}")
        t(s"$label read sink")(spark.table(name).count())
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // 1. plain append (no state): isolates source+sink+WAL fixed cost
    drain("append", ev().select(lit("+I").as("op"), col("event_id")), "append")
    // 2. dedup (state store): the q_stream_dedup shape
    drain("dedup", ev().unionByName(ev())
      .withWatermark("ts", "10 minutes").dropDuplicates("event_id", "ts"), "append")
    // 3. windowed agg complete-mode (q_stream_tumbling shape)
    drain("tumbling", ev().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n")), "complete")
    // 4. repeat append to see steady-state (classloading amortized?)
    drain("append2", ev().select(lit("+I").as("op"), col("event_id")), "append")
    drain("dedup2", ev().unionByName(ev())
      .withWatermark("ts", "10 minutes").dropDuplicates("event_id", "ts"), "append")
    spark.stop()
  }
}
