package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries into plans/r14/<q>_<tag>.txt
  * (the round-14 optimization evidence files). Usage:
  *   sbt "Test/runMain graft.R14Plans <tag> <query> [<query> ...]"
  * Runs at sf0.1 under the bench's own session shape (local[32],
  * shuffle.partitions=32, AQE on) so the dumped plan is the plan the bench
  * times. The formatted plan is captured BEFORE execution (initial AQE plan)
  * plus the executed plan afterwards, expression ids stripped for diffing.
  */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val names = args.tail.toSeq
    // the bench's own session shape, so the dumped plan is the timed plan
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("/root/repo/plans/r14"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sf)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect() // finalize AQE so the executed dump shows reused stages
      val executed = df.queryExecution.executedPlan.toString
      val clean = (s: String) => s.replaceAll("#\\d+[L]?", "")
      val out = s"== $name ($tag) — explain formatted (initial plan, AQE not yet finalized) ==\n\n" +
        clean(formatted) +
        s"\n\n== $name ($tag) — executed plan after AQE ==\n\n" + clean(executed) + "\n"
      Files.writeString(Paths.get(s"/root/repo/plans/r14/${name}_$tag.txt"), out)
      println(s"WROTE plans/r14/${name}_$tag.txt")
    }
    spark.stop()
  }
}
