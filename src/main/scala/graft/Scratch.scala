package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.streaming.Trigger
    val wh = java.nio.file.Files.createTempDirectory("scr_wh_").toString
    val cat = new graft.table.GraftCatalog(spark, wh)
    val tbl = cat.createTable("v2db", "agg_cl",
      Map("primary-key" -> "l_orderkey", "bucket" -> "4",
        "changelog-producer" -> "input",
        "fields.qty_cents.aggregate-function" -> "sum",
        "fields.max_price.aggregate-function" -> "max"))
    val root = s"$wh/v2db.db/agg_cl"
    val chk = java.nio.file.Files.createTempDirectory("scr_chk_").toString
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_cents"),
      col("l_extendedprice").as("max_price"), col("l_partkey"))
    def drain(tag: String): Unit = time(s"drain-$tag") {
      val q = spark.readStream.format("graft").option("read-changelog", "true")
        .load(root)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect(); ()
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    time("append0")(tbl.appendBatch(li.where(col("l_partkey") % 2 === 0).drop("l_partkey"), 0L))
    drain("catchup")
    time("append1")(tbl.appendBatch(li.where(col("l_partkey") % 2 === 1).drop("l_partkey"), 1L))
    drain("delta")
    spark.stop()
  }
}
