package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark over all declared queries at SPARK_GRAFT_SF_DIR.
  *
  * Output contract: ONE compact JSON line on stdout. The driver captures only
  * the tail of the run's output, so the line must stay small: `value` is the
  * total over ALL queries, `queries` holds the slowest 15, `families` rolls
  * every query up by prefix, and `errors` names any query that threw (a
  * failure must not silently deflate the total — it is reported, and its
  * elapsed time still counts). Full per-query timings go to
  * `BENCH_DETAIL.json` in the working directory.
  *
  * Queries run in sorted-name order so per-round numbers are comparable; an
  * untimed warmup absorbs JVM/classloader/codegen startup so timings measure
  * the queries, not session bring-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: parquet reader + codegen + shuffle machinery
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column through the FULL plan
      // (a count() would let Catalyst prune projections and elide the final
      // sort, understating real query cost)
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => errors ::= name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def dict(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")

    val total = results.map(_._2).sum
    val slowest = results.sortBy(-_._2).take(15)
    val families = results
      .groupBy { case (n, _) => n.split("_").take(2).mkString("_") }
      .map { case (f, rs) => f -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val errJson = errors.sorted.map(e => s""""$e"""").mkString("[", ",", "]")

    // full per-query detail for the repo (small file, not stdout)
    val detail = s"""{"total_sec":${fmt(total)},"n_queries":${results.size},""" +
      s""""errors":$errJson,"sf":"$sfDir","cpus":$cpus,""" +
      s""""queries":${dict(results)}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"), detail.getBytes)
    catch { case _: Throwable => () }

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"errors":$errJson,""" +
      s""""families":${dict(families)},"queries":${dict(slowest)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
