package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for graft.ops.Retrieval + graft.ops.Tokenize beyond the
  * DuckDB oracle (which already hash-matches them): the invariants a reader
  * of the ops should be able to rely on. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, SparkFixture.sf)

  test("sq8 codes stay in [0, 255] and reconstruction error is small") {
    val rows = run("q_ext_sq8_encode").collect()
    assert(rows.length == 500)
    for (r <- rows; c <- Seq("c1", "c32", "c64")) {
      val v = r.getAs[Int](c)
      assert(v >= 0 && v <= 255, s"code $c=$v out of int8 range")
    }
    // 64 dims, values ~[-0.3,0.3], 255 steps → per-dim err ≤ (range/255/2)²;
    // SSE over 64 dims stays well under 0.001 (observed ~1e-5)
    assert(rows.forall(_.getAs[Long]("sse_nano") < 1000000L),
      "reconstruction SSE should be < 1e-3 for int8 quantization")
  }

  test("sq8 asymmetric search finds the query vector itself first") {
    val top = run("q_ext_sq8_search").collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("vec_id") == 0L,
      "rank-1 of the quantized search must be the query vector")
    val cos = top.map(_.getAs[Long]("cos_micro"))
    assert(cos.sameElements(cos.sorted.reverse), "rerank is cosine-descending")
  }

  test("MMR picks are distinct, round-1 is the relevance argmax, and diversity binds") {
    val picks = run("q_ext_mmr_rerank").collect()
    assert(picks.length == 5)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // round 1 ignores diversity: it must be the global top-rel candidate —
    // vec 0 vs itself has the max possible relevance → always picked first
    assert(picks.head.getAs[Long]("vec_id") == 0L)
    // later rounds may deviate from pure-relevance order (diversity term);
    // at minimum the rel_micro column is a valid exact integer score
    assert(picks.forall(_.getAs[Long]("rel_micro") <= 1000000L))
  }

  test("RetrievalFlow: persisted index round-trips codes; search is deterministic") {
    val ix = graft.examples.RetrievalFlow.build(spark, SparkFixture.sf)
    // (a) the persisted (vec_id, cs) agree with a direct recomputation
    val emb = Tables.embeddings(spark, SparkFixture.sf)
    val direct = emb
      .crossJoin(broadcast(graft.ops.Retrieval.statsRow(emb)))
      .withColumn("cs", graft.ops.Retrieval.sparkCodes)
      .select(col("vec_id"), col("cs").as("cs_direct"))
    val mismatches = ix.index.read.join(direct, Seq("vec_id"))
      .filter(col("cs") =!= col("cs_direct")).count()
    assert(mismatches == 0, s"$mismatches persisted code arrays diverge")
    assert(ix.index.read.count() == 500)
    assert(ix.centroids.read.count() == 8)
    // (b) searching the stored index finds the query vector first, twice
    val r1 = graft.examples.RetrievalFlow.search(spark, SparkFixture.sf, ix, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val r2 = graft.examples.RetrievalFlow.search(spark, SparkFixture.sf, ix, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.length == 5 && r1.head._1 == 0L)
    assert(r1.toSeq == r2.toSeq)
  }

  test("bpe merge candidates are 2-char pairs with positive weighted counts") {
    val rows = run("q_ext_bpe_merge").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val counts = rows.map(_.getAs[Long]("n_pair"))
    assert(counts.forall(_ > 0) && counts.sameElements(counts.sorted.reverse))
  }

  test("CMS estimates never underestimate and are deterministic across runs") {
    val a = run("q_ext_cms_heavy_hitters").collect()
    assert(a.length == 10)
    for (r <- a) {
      assert(r.getAs[Boolean]("admissible"),
        s"CMS underestimated ${r.getAs[String]("word")}")
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"))
    }
    val b = run("q_ext_cms_heavy_hitters").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "sketch must be deterministic")
  }

  test("oov rate is consistent with its own counts and bounded by [0,1]") {
    val rows = run("q_ext_oov_rate").collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (n, oov, rate) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Double]("oov_rate"))
      assert(oov >= 0 && oov <= n)
      assert(rate == oov.toDouble / n)
    }
    // top-20 vocab over a 31-word corpus: some docs must contain OOV tokens
    assert(rows.exists(_.getAs[Long]("n_oov") > 0))
  }
}
