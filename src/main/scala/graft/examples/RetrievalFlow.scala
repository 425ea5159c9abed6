package graft.examples

import java.nio.file.Files

import graft.Tables
import graft.table.StreamTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The retrieval-scale ops composed as a PERSISTED index-build + search
  * pipeline — the vector-side sibling of [[CurationFlow]]: at 100 TB the
  * index is not a DataFrame you keep around, it is a TABLE a separate
  * search job opens later. This flow builds the index artifacts with the
  * registry ops' shared contracts and persists each as a [[StreamTable]]:
  *
  *  embeddings
  *   → SQ8 stats row (q_ext_sq8_encode's 128-expr min/max pass)  → `stats` table
  *   → IVF coarse centroids (Ext.argmaxCells contract)           → `centroids` table
  *   → per-vector (cell id, SQ8 code array)                      → `index` table
  *
  * and then answers a query FROM the persisted tables alone (plus the raw
  * embeddings for the final exact rerank, exactly like a production two-tier
  * search): centroid argmax → probe the query's cell → ADC rank the cell's
  * codes (Retrieval.adcDotFromCodes) → exact-cosine rerank the shortlist.
  *
  * RetrievalSpec proves (a) the persisted codes round-trip identical to the
  * directly-computed ones and (b) the search is deterministic with the query
  * vector ranked first.
  *
  * Run: sbt "runMain graft.examples.RetrievalFlow"
  */
object RetrievalFlow {

  final case class Index(stats: StreamTable, centroids: StreamTable, index: StreamTable)

  /** Build and persist the index artifacts for the embeddings at `d`. */
  def build(s: SparkSession, d: String): Index = {
    val emb = Tables.embeddings(s, d)
    val root = Files.createTempDirectory("graft_retr_flow_").toString

    val statsT = new StreamTable(s"$root/stats", s)
    statsT.appendBatch(graft.ops.Retrieval.statsRow(emb), batchId = 0)

    val (cent, cell) = graft.ops.Ext.argmaxCells(emb)
    val centT = new StreamTable(s"$root/centroids", s)
    centT.appendBatch(cent, batchId = 0)

    val codes = emb.crossJoin(broadcast(statsRow(statsT)))
      .withColumn("cs", graft.ops.Retrieval.sparkCodes)
      .select("vec_id", "cs")
    val idxT = new StreamTable(s"$root/index", s, bucketKey = Some("cid"))
    idxT.appendBatch(
      codes.join(cell.select("vec_id", "cid"), Seq("vec_id")), batchId = 0)
    Index(statsT, centT, idxT)
  }

  private def statsRow(t: StreamTable): DataFrame = t.read.select("mn", "mx")

  /** Search the persisted index: probe the query vector's cell, ADC-rank its
    * codes, exact-rerank the top `shortlist` to `k`. Only the 1-row stats,
    * the 8-row centroids and the 64-float query ever broadcast. */
  def search(s: SparkSession, d: String, ix: Index, queryVecId: Long,
      shortlist: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = broadcast(emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    graft.functions.VectorFunctions.registerOn(s)
    val qcell = ix.centroids.read.crossJoin(q)
      .withColumn("dp", call_function("float_dot", col("ce"), col("qe")))
      .orderBy(col("dp").desc, col("cid")).limit(1).select("cid")
    val cand = ix.index.read.join(broadcast(qcell), Seq("cid"))
      .crossJoin(broadcast(statsRow(ix.stats))).crossJoin(q)
      .withColumn("adc", graft.ops.Retrieval.adcDotFromCodes)
      .orderBy(col("adc").desc, col("vec_id")).limit(shortlist)
      .select("vec_id")
    cand.join(emb, Seq("vec_id")).crossJoin(q)
      .withColumn("cm", floor(graft.ops.Ext.cosCol("embedding", "qe") * lit(1e6)))
      .select(col("vec_id"), col("cm").as("cos_micro"))
      .orderBy(col("cm").desc, col("vec_id")).limit(k)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-retrieval-flow")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val d = "/root/testdata/sf0.001"
      val ix = build(spark, d)
      println(s"index rows: ${ix.index.read.count()}, " +
        s"centroids: ${ix.centroids.read.count()}")
      search(spark, d, ix, queryVecId = 0).show(truncate = false)
    } finally spark.stop()
  }
}
