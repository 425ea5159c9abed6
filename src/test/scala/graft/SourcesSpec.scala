package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink-layer behavior pins beyond the oracle: the dynamic partition
  * overwrite claim (only the partitions present in the incoming data are
  * rewritten) asserted at the file level. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def partFiles(dir: String, part: String): Set[String] = {
    val p = Paths.get(dir, part)
    if (!Files.isDirectory(p)) return Set.empty
    val s = Files.list(p)
    try {
      val it = s.iterator()
      var out = Set.empty[String]
      while (it.hasNext) {
        val f = it.next().getFileName.toString
        if (f.endsWith(".parquet")) out += f
      }
      out
    } finally s.close()
  }

  test("dynamic partition overwrite touches only the incoming partitions") {
    val dir = Files.createTempDirectory("graft_dynpart_spec_").toString
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "pt", "v")
      .write.mode("overwrite").partitionBy("pt").parquet(dir)
    val aBefore = partFiles(dir, "pt=a")
    val bBefore = partFiles(dir, "pt=b")
    assert(aBefore.nonEmpty && bBefore.nonEmpty)

    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((9L, "a", 99.0)).toDF("id", "pt", "v")
        .write.mode("overwrite").partitionBy("pt").parquet(dir)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    // the untouched partition keeps exactly its files; the incoming
    // partition is replaced wholesale
    assert(partFiles(dir, "pt=b") == bBefore, "untouched partition must keep its files")
    assert(partFiles(dir, "pt=a") != aBefore, "incoming partition must be rewritten")
    val rows = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("pt"), r.getAs[Double]("v")))
    assert(rows.toSeq == Seq((2L, "b", 2.0), (9L, "a", 99.0)))
  }
}
