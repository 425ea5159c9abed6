package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (UTC, small shuffle width). */
object SparkFixture {
  lazy val spark: SparkSession = {
    // keep metastore/warehouse artifacts out of the repo working dir
    val scratch = java.nio.file.Files.createTempDirectory("graft_wh_root_").toString
    System.setProperty("derby.system.home", scratch)
    val s = SparkSession.builder()
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
