package graft
import org.apache.spark.sql.functions._

/** Scratch timing probe for round-14 optimization work (test scope, not a
  * declared surface). Times pageRankMicro's phases at sf0.1 under the bench
  * session shape. */
object R14Probe {
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
    val sf = "/root/testdata/sf0.1"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    spark.read.parquet(s"$sf/lineitem.parquet").groupBy("l_returnflag").count().collect()

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      t("q_ext_pagerank e2e") {
        SparkEntry.queries("q_ext_pagerank")(spark, sf)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
