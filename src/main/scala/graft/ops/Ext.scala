package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star LLM-data-pipeline extensions (SURVEY.md §2B "North-star
  * extensions" + the builder prompt's training-data-pipeline operators):
  * exact/near dedup, similarity search, text analysis, multimodal join.
  *
  * Scale posture: every query is a shuffle-respecting DataFrame program —
  * dedup partitions by a *hash* of the text (not the full text, so 100 TB of
  * document bodies never become shuffle keys), MinHash is one explode +
  * two hash-aggregations, cosine top-k broadcasts only the query vector.
  */
/** Shared text-shape expressions: ONE definition of tokenization/shingling so
  * dedup, decontamination and packing can never silently diverge on what a
  * "word" or an "n-gram" is. */
private[graft] object TextOps {
  import org.apache.spark.sql.Column

  /** Distinct word n-gram shingles of a pre-split array column named `ws`. */
  def shingles(n: Int): Column = {
    val parts = (0 until n).map(k => s"element_at(ws, i + $k)").mkString(", ")
    expr(s"array_distinct(transform(sequence(1, size(ws) - ${n - 1}), " +
      s"i -> concat_ws(' ', $parts)))")
  }

  /** Non-empty word count of the `text` column (the shared `dl`/`n_tokens`
    * definition). */
  def nWords: Column =
    size(expr("filter(split(text, ' '), w -> w != '')")).cast("long")

  /** Non-empty word tokens of the `text` column, ready to explode — the ONE
    * tokenization contract every oracle's string_split/list_filter mirrors. */
  def words: Column =
    expr("filter(split(text, ' '), x -> x <> '')")
}

object Ext {

  /** 64 dims; element-wise ops stay inside codegen'd higher-order functions. */
  private def dot(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)")
  private def norm2(a: String): org.apache.spark.sql.Column =
    sqrt(expr(s"aggregate(transform($a, x -> cast(x AS double) * cast(x AS double)), 0D, (acc, v) -> acc + v)"))

  /** DuckDB-side dot/norm over list<float> with the same left-fold order. */
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def duckNorm(a: String): String =
    s"sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))"

  /** Shared exact-cosine contract (both engines, identical left-fold FP
    * tree) for ops outside this file (graft.ops.Retrieval): session-free —
    * higher-order-function fold, not the registered float_dot. */
  private[graft] def cosCol(a: String, b: String): org.apache.spark.sql.Column =
    dot(a, b) / (norm2(a) * norm2(b))
  private[ops] def duckCosSql(a: String, b: String): String =
    s"${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)})"

  /** The ONE exact vector-mean quantization contract (q_ext_embed_center +
    * q_ext_kmeans + q_ext_power_iter, both engines): each element (times an
    * optional per-row weight, e.g. power iteration's x·v dot) floor-quantized
    * to integer NANOS, 64 per-dimension long sums (named s1..s64, map-side
    * combined), means recovered by integer div over a count column named
    * `n`. Any change here must change all four faces together — that is the
    * point of sharing them. */
  private[ops] def nanoSumExprs(weight: Option[org.apache.spark.sql.Column] = None)
      : Seq[org.apache.spark.sql.Column] =
    (1 to 64).map { i =>
      val e = expr(s"CAST(element_at(embedding, $i) AS DOUBLE)")
      sum(floor(weight.map(e * _).getOrElse(e) * lit(1e9)).cast("long"))
        .as(s"s$i")
    }
  private def muArrayExpr: org.apache.spark.sql.Column =
    array((1 to 64).map { i =>
      (expr(s"s$i div n").cast("double") / lit(1e9)): org.apache.spark.sql.Column
    }: _*)
  private[ops] def duckNanoSums(weight: Option[String] = None): String = {
    val w = weight.map(x => s" * $x").getOrElse("")
    (1 to 64).map(i =>
      s"CAST(SUM(CAST(floor(CAST(embedding[$i] AS DOUBLE)$w * 1000000000) AS BIGINT)) AS BIGINT) AS s$i")
      .mkString(", ")
  }
  private def duckNanoMeans: String =
    (1 to 64).map(i => s"CAST(s$i // n AS DOUBLE) / 1000000000.0")
      .mkString("[", ", ", "]")

  /** The shared centroid/assignment contract (q_ext_cosine_ivf, the
    * q_ext_ann_recall family, q_ext_kmeans seeding, q_ext_semdedup): 8
    * md5-ordered centroid vectors drawn FROM the given corpus, every vector
    * assigned to its argmax-dot cell with the (dp DESC, cid ASC) tie-break.
    * ONE definition per engine so no caller can fork the contract. */
  private[graft] def argmaxCtes(src: String): String =
    s"""c AS (SELECT vec_id AS cid, embedding AS ce FROM $src
       |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
       |a AS (SELECT v.vec_id, v.embedding, c.cid,
       |        row_number() OVER (PARTITION BY v.vec_id
       |          ORDER BY ${duckDot("v.embedding", "c.ce")} DESC, c.cid) AS rn
       |      FROM $src v, c),
       |cell AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1)""".stripMargin

  /** Spark side of [[argmaxCtes]]: broadcast-K crossJoin + map-side-combined
    * max_by over (dp, -cid) ≡ the oracle's ORDER BY dp DESC, cid ASC. */
  private[graft] def argmaxCells(corpus: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val cent = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    (cent, assignCells(corpus, cent))
  }

  /** The assignment half of [[argmaxCells]], against a GIVEN centroid frame
    * — what an incremental index-maintenance job runs per arriving batch
    * (graft.streaming: the centroids stay fixed, only new vectors assign). */
  private[graft] def assignCells(vecs: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.VectorFunctions.registerOn(vecs.sparkSession)
    vecs.crossJoin(broadcast(cent))
      .withColumn("dp", call_function("float_dot", col("embedding"), col("ce")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("dp"), (-col("cid")).as("nc"))).as("cid"),
        first(col("embedding")).as("embedding"))
  }

  /** The shared PQ contract (q_ext_pq_encode + q_ext_ivfpq_search): a
    * 16-row md5-ordered codebook; each vector's 8 subspaces (8 dims each)
    * encoded by squared-L2 argmin with the (dist ASC, cid ASC) tie-break.
    * One definition per engine — the encoder and the searcher must use the
    * SAME codes or ADC distances are garbage.
    *
    * Both engines compute the subspace distance DECOMPOSED:
    * ‖x−c‖² = ‖x‖² + ‖c‖² − 2·x·c, associated as (xx + cc) − (2·xc), every
    * dot a left-to-right double sum. On the Spark side that turns the hot
    * loop into codegen'd [[graft.functions.FloatDot]] calls over subspace
    * slices materialized ONCE per side — ‖x‖² per vector (not per pair),
    * ‖c‖² on the 16-row broadcast side — instead of 128 interpreted
    * zip_with/aggregate lambdas per pair. The oracle mirrors the exact
    * arithmetic so the 6-decimal err/ADC outputs stay bit-consistent. */
  private def pqSubDist(sub: Int): org.apache.spark.sql.Column = {
    val lo = 8 * sub - 7
    expr(s"float_dot(slice(embedding, $lo, 8), slice(embedding, $lo, 8))" +
      s" + float_dot(slice(ce, $lo, 8), slice(ce, $lo, 8))" +
      s" - 2D * float_dot(slice(embedding, $lo, 8), slice(ce, $lo, 8))")
  }
  private def pqCodebook(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
  /** One row per vec_id with the 8 winning (dist, cid) structs m1..m8 —
    * lexicographic struct-min ≡ the oracle's ORDER BY dist, cid. */
  private def pqMins(src: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.VectorFunctions.registerOn(src.sparkSession)
    def dot(a: String, b: String) = call_function("float_dot", col(a), col(b))
    // subspace slices + self-dots materialized once per SIDE, so the
    // per-pair work is 8 codegen'd dots + 3 double ops per subspace
    val v = src.select(Seq(col("vec_id")) ++
      (1 to 8).map(s0 => expr(s"slice(embedding, ${8 * s0 - 7}, 8)").as(s"x$s0")): _*)
      .select(Seq(col("vec_id")) ++ (1 to 8).map(s0 => col(s"x$s0")) ++
        (1 to 8).map(s0 => dot(s"x$s0", s"x$s0").as(s"xx$s0")): _*)
    val c = cb.select(Seq(col("cid")) ++
      (1 to 8).map(s0 => expr(s"slice(ce, ${8 * s0 - 7}, 8)").as(s"c$s0")): _*)
      .select(Seq(col("cid")) ++ (1 to 8).map(s0 => col(s"c$s0")) ++
        (1 to 8).map(s0 => dot(s"c$s0", s"c$s0").as(s"cc$s0")): _*)
    val paired = v.crossJoin(broadcast(c))
      .select(Seq(col("vec_id"), col("cid")) ++
        (1 to 8).map(s0 => (col(s"xx$s0") + col(s"cc$s0") -
          lit(2d) * dot(s"x$s0", s"c$s0")).as(s"d$s0")): _*)
    val mins = (1 to 8).map(sub =>
      min(struct(col(s"d$sub"), col("cid"))).as(s"m$sub"))
    paired.groupBy("vec_id").agg(mins.head, mins.tail: _*)
  }
  /** DuckDB side of the PQ contract, parameterized by the candidate source
    * CTE: codebook, per-pair subspace distances (same decomposed
    * arithmetic as [[pqMins]]), per-subspace argmin winners joined into
    * one `codes` row per vec_id. */
  private def pqCodesCtes(src: String): String = {
    def dist(sub: Int) = {
      val lo = 8 * sub - 7
      def d(a: String, b: String) =
        s"list_sum(list_transform(range($lo, ${lo + 8}), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
      s"${d("v.embedding", "v.embedding")} + ${d("c.ce", "c.ce")}" +
        s" - 2 * ${d("v.embedding", "c.ce")}"
    }
    val dcols = (1 to 8).map(s0 => s"(${dist(s0)}) AS d$s0").mkString(", ")
    val ms = (1 to 8).map(s0 =>
      s"""m$s0 AS (SELECT vec_id, cid AS code$s0, d$s0 FROM (
         |  SELECT vec_id, cid, d$s0, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY d$s0, cid) AS rn FROM pd) WHERE rn = 1)""".stripMargin)
      .mkString(",\n")
    val joins = (2 to 8).map(s0 => s"JOIN m$s0 USING (vec_id)").mkString(" ")
    val cols = (1 to 8).map(s0 => s"code$s0").mkString(", ") + ", " +
      (1 to 8).map(s0 => s"d$s0").mkString(", ")
    s"""cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |pd AS (SELECT v.vec_id, c.cid, $dcols FROM $src v, cb c),
       |$ms,
       |codes AS (SELECT vec_id, $cols FROM m1 $joins)""".stripMargin
  }

  /** Shared IVF index construction (q_ext_cosine_ivf + the q_ext_ann_recall
    * family at every probe count): the [[argmaxCtes]] contract over the
    * embeddings table; the vec_id=0 query resolves its own cell. */
  private val ivfSqlCtes: String =
    s"""${argmaxCtes("embeddings")},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qcell AS (SELECT cid AS qcid FROM cell WHERE vec_id = 0)""".stripMargin

  /** Spark side of [[ivfSqlCtes]], via [[argmaxCells]]. */
  private final case class IvfIndex(
      cent: org.apache.spark.sql.DataFrame,
      cell: org.apache.spark.sql.DataFrame,
      q: org.apache.spark.sql.DataFrame,
      qcell: org.apache.spark.sql.DataFrame)
  private def ivfIndex(s: org.apache.spark.sql.SparkSession, d: String): IvfIndex = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val (cent, cell) = argmaxCells(emb)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val qcell = cell.filter(col("vec_id") === 0).select(col("cid").as("qcid"))
    IvfIndex(cent, cell, q, qcell)
  }

  /** The ANN recall@10 evaluation at a given probe count — ONE pipeline
    * definition (exact top-10, probed-cells top-10, overlap, fraction) so
    * the per-probe variants can never diverge; only the probe-cell set
    * (query's `probes` nearest centroids) is parameterized. */
  private def annRecall(name: String, probes: Int): QDef = QDef(
    name,
    s"""WITH $ivfSqlCtes,
       |qc AS (SELECT c.cid, row_number() OVER (
       |         ORDER BY ${duckDot("c.ce", "q.qe")} DESC, c.cid) AS qrn FROM c, q),
       |qcells AS (SELECT cid FROM qc WHERE qrn <= $probes),
       |ex AS (SELECT v.vec_id FROM embeddings v, q WHERE v.vec_id <> 0
       |       ORDER BY ${duckDot("v.embedding", "q.qe")} / (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}) DESC, v.vec_id LIMIT 10),
       |iv AS (SELECT v.vec_id FROM cell v, q WHERE v.cid IN (SELECT cid FROM qcells) AND v.vec_id <> 0
       |       ORDER BY ${duckDot("v.embedding", "q.qe")} / (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}) DESC, v.vec_id LIMIT 10),
       |ov AS (SELECT count(*) AS n_overlap FROM ex JOIN iv USING (vec_id)),
       |ne AS (SELECT count(*) AS n_exact FROM ex), ni AS (SELECT count(*) AS n_ivf FROM iv)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_ivf AS BIGINT) AS n_ivf,
       |  CAST(n_overlap AS BIGINT) AS n_overlap,
       |  CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
       |FROM ne, ni, ov""".stripMargin) { (s, d) =>
    def fdot(a: String, b: String) = call_function("float_dot", col(a), col(b))
    val IvfIndex(cent, cell, q, _) = ivfIndex(s, d)
    // the query's `probes` nearest centroids — for probes=1 this is exactly
    // its assigned cell (same argmax, same (dot DESC, cid) tie-break)
    val qcells = cent.crossJoin(broadcast(q))
      .withColumn("dp", fdot("ce", "qe"))
      .orderBy(col("dp").desc, col("cid").asc).limit(probes).select("cid")
    def cos = fdot("embedding", "qe") /
      (sqrt(fdot("embedding", "embedding")) * sqrt(fdot("qe", "qe")))
    val ex = Tables.embeddings(s, d).select("vec_id", "embedding")
      .filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .orderBy(cos.desc, col("vec_id").asc).limit(10).select("vec_id")
    val iv = cell.join(broadcast(qcells), Seq("cid"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .orderBy(cos.desc, col("vec_id").asc).limit(10).select("vec_id")
    val ov = ex.join(iv, Seq("vec_id")).agg(count(lit(1)).as("n_overlap"))
    val ne = ex.agg(count(lit(1)).as("n_exact"))
    val ni = iv.agg(count(lit(1)).as("n_ivf"))
    ne.crossJoin(ni).crossJoin(ov)
      .select(col("n_exact"), col("n_ivf"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  /** `planes`-bit sign-LSH signature of `embedding` (≤32): fixed ±1
    * hyperplanes (Lehmer-style mix of (dim, bit)), each sign test a codegen'd
    * `float_dot` against a literal plane — the interpreted-HOF version cost
    * 256 boxed lambda calls per row. The bit count is a SCALE parameter:
    * bucket count must grow with the corpus (a constant partition means each
    * bucket grows linearly and any intra-bucket join quadratically), so
    * callers BAND the signature ([[lshBands]]) instead of probing one
    * monolithic 2^planes bucket. */
  private def signLsh(s: SparkSession, planes: Int): org.apache.spark.sql.Column = {
    graft.functions.VectorFunctions.registerOn(s)
    (0 until planes).map { b =>
      val plane = array((1 to 64).map(i =>
        lit(if (Math.floorMod(i * 48271 + b * 1299721, 1009) < 504) 1.0f
            else -1.0f)): _*)
      when(call_function("float_dot", col("embedding"), plane) > 0d,
        lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Band a signature into `nb` bands of `w` bits, exploded as
    * struct(band, bv) rows — classic LSH banding: near-identical vectors
    * agree on ≥1 whole band with high probability, while each band still
    * splits the corpus across 2^w buckets (grow `w` with corpus size). */
  private def lshBands(sig: org.apache.spark.sql.Column, nb: Int, w: Int)
      : org.apache.spark.sql.Column =
    explode(array((0 until nb).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sig, b * w).bitwiseAND(lit((1 << w) - 1)).as("bv"))): _*))

  val all: Seq[QDef] = Seq(
    QDef(
      "q_ext_exact_dedup",
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      // Partition by md5(text), not text: same groups (128-bit collision-free
      // in practice) but the shuffle key is 16 bytes instead of the document
      // body — the difference between feasible and not at 100 TB.
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    // MinHash + LSH near-duplicate candidates. No SQL oracle (LSH is
    // probabilistic); ExtSpec asserts the planted near-duplicates are found.
    // Pipeline: word 3-shingles → 16 minhashes (xxhash64, seeds 0..15) →
    // 4 bands × 4 rows → band-signature buckets → intra-bucket pairs.
    QDef.noOracle("q_ext_minhash_neardup") { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      // Plant deterministic near-duplicates (doc_id + 1,000,000 = original
      // text + a short tail) so the candidate-pair output is non-empty and
      // recall is testable at any scale factor.
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" extra tail token")).as("text"))
      val corpus = docs.unionByName(planted)

      val shingles = corpus
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextOps.shingles(3)).as("sh"))

      // All 16 minhashes in ONE aggregation pass (16 agg expressions), not a
      // 16× seed-explode of the shingle stream — at 100 TB the explode would
      // multiply shuffle volume 16-fold for no benefit. The shingle STRING is
      // hashed once; the 16 permutations re-hash the fixed-width 64-bit value
      // (8-byte input) instead of re-hashing the string 16 times.
      val hashed = shingles.withColumn("h", xxhash64(col("sh")))
      val mhCols = (0 until 16).map(i =>
        min(xxhash64(col("h"), lit(i))).as(s"mh$i"))
      val minhashes = hashed.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)

      val bandSigs = minhashes
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, 3), b -> struct(b AS band, concat_ws(',',
            |  element_at(array(mh0,mh1,mh2,mh3,mh4,mh5,mh6,mh7,mh8,mh9,mh10,mh11,mh12,mh13,mh14,mh15), b*4+1),
            |  element_at(array(mh0,mh1,mh2,mh3,mh4,mh5,mh6,mh7,mh8,mh9,mh10,mh11,mh12,mh13,mh14,mh15), b*4+2),
            |  element_at(array(mh0,mh1,mh2,mh3,mh4,mh5,mh6,mh7,mh8,mh9,mh10,mh11,mh12,mh13,mh14,mh15), b*4+3),
            |  element_at(array(mh0,mh1,mh2,mh3,mh4,mh5,mh6,mh7,mh8,mh9,mh10,mh11,mh12,mh13,mh14,mh15), b*4+4)) AS sig))"""
            .stripMargin)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))

      // Candidate pairs via a SELF-JOIN on (band, sig) — shuffle-native: a
      // degenerate bucket spreads across join tasks instead of collecting
      // every member doc_id into one giant in-row array (the collect_list
      // version put O(bucket) ids in ONE row and O(bucket²) pairs through
      // one explode). Mega-buckets (mass-duplicated boilerplate) are capped
      // out entirely: at corpus scale those are exact-dup clusters, already
      // owned by q_ext_exact_dedup, and would cost O(n²) pairs here.
      val sizes = bandSigs.groupBy("band", "sig").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 100000)
      // all three shuffles key on (band, sig): the join reuses the groupBy's
      // partitioning, so the guard costs no extra exchange of the big side
      val member = bandSigs.join(sizes.select("band", "sig"), Seq("band", "sig"))
      val pa = member.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
      val pb = member.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
      pa.join(pb, Seq("band", "sig"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("shared_bands"))
        .orderBy("doc_a", "doc_b")
    },

    // Brute-force cosine top-k vs. the vec_id=0 query vector — the exact
    // baseline for ANN. Only the 64-float query vector is broadcast; the
    // corpus side streams through codegen'd array arithmetic.
    QDef(
      "q_ext_cosine_topk",
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |  round(${duckDot("v.embedding", "q.qe")} /
         |        (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}), 6) AS cos_sim
         |FROM embeddings v, q
         |WHERE v.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(dot("embedding", "qe") / (norm2("embedding") * norm2("qe")), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    },

    QDef(
      "q_ext_text_stats",
      """SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  n_chars,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"),
          col("n_chars"),
          (length(regexp_replace(col("text"), " ", "")).cast("double")
            / size(split(col("text"), " "))).as("avg_word_len"))
        .orderBy("doc_id")
    },

    // Language-ID by stopword heuristic (n-gram-style marker words). The
    // oracle runs the identical rule, so this checks the *pipeline*, not
    // linguistic truth (the synthetic corpus is English-ish word soup).
    QDef(
      "q_ext_lang_id",
      """SELECT doc_id, lang,
        |  CASE WHEN ' ' || text || ' ' LIKE '% der %' OR ' ' || text || ' ' LIKE '% und %' THEN 'de'
        |       WHEN ' ' || text || ' ' LIKE '% el %' OR ' ' || text || ' ' LIKE '% la %' THEN 'es'
        |       WHEN ' ' || text || ' ' LIKE '% le %' OR ' ' || text || ' ' LIKE '% et %' THEN 'fr'
        |       WHEN ' ' || text || ' ' LIKE '% the %' OR ' ' || text || ' ' LIKE '% a %' THEN 'en'
        |       ELSE 'unk' END AS pred_lang,
        |  (CASE WHEN ' ' || text || ' ' LIKE '% der %' OR ' ' || text || ' ' LIKE '% und %' THEN 'de'
        |       WHEN ' ' || text || ' ' LIKE '% el %' OR ' ' || text || ' ' LIKE '% la %' THEN 'es'
        |       WHEN ' ' || text || ' ' LIKE '% le %' OR ' ' || text || ' ' LIKE '% et %' THEN 'fr'
        |       WHEN ' ' || text || ' ' LIKE '% the %' OR ' ' || text || ' ' LIKE '% a %' THEN 'en'
        |       ELSE 'unk' END = lang) AS correct
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      def has(wrd: String) = padded.like(s"% $wrd %")
      val pred = when(has("der") || has("und"), "de")
        .when(has("el") || has("la"), "es")
        .when(has("le") || has("et"), "fr")
        .when(has("the") || has("a"), "en")
        .otherwise("unk")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), pred.as("pred_lang"),
          (pred === col("lang")).as("correct"))
        .orderBy("doc_id")
    },

    QDef(
      "q_ext_quality_score",
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '),
        |       w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  (length(text) BETWEEN 100 AND 500) AS len_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          ((length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
            .cast("double") / length(col("text"))).as("punct_ratio"),
          (size(expr("filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'and', 'is'))"))
            .cast("double") / size(toks)).as("stop_ratio"),
          length(col("text")).between(100, 500).as("len_ok"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: md5 content hash of the normalized text (the
    // deterministic, engine-portable analog of a rolling hash).
    QDef(
      "q_ext_fingerprint",
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        |  substring(md5(lower(trim(text))), 1, 8) AS fp8
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val fp = md5(lower(trim(col("text"))))
      Tables.documents(s, d)
        .select(col("doc_id"), fp.as("fp"), substring(fp, 1, 8).as("fp8"))
        .orderBy("doc_id")
    },

    // BPE-ish token counting: letter runs, digit runs, single punctuation.
    QDef(
      "q_ext_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("int")
            .as("n_bpe_tokens"),
          size(split(col("text"), " ")).as("n_ws_tokens"))
        .orderBy("doc_id")
    },

    // n-gram Jaccard similarity: exact set overlap of word 3-gram shingles
    // for a deterministic candidate sample (every 37th doc, same lang —
    // candidate bounding BEFORE the quadratic pair space, as at scale).
    QDef(
      "q_ext_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3 AND doc_id % 37 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val grams = Tables.documents(s, d)
        .filter(col("doc_id") % 37 === 0)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), col("lang"), TextOps.shingles(3).as("grams"))
      val a = grams.select(col("doc_id").as("doc_a"), col("lang"), col("grams").as("ga"))
      val b = grams.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("grams").as("gb"))
      a.join(b, a("lang") === b("lang_b") && a("doc_a") < b("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("ga"), col("gb"))).cast("double")
            / size(array_union(col("ga"), col("gb")))).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // SimHash near-dup fingerprints: 16-bit signatures from per-word hash
    // votes; near-duplicates differ in few bits (Hamming). xxhash64 has no
    // DuckDB analog → no oracle; ExtSpec plants near-dups and checks radius.
    QDef.noOracle("q_ext_simhash") { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" tiny suffix")).as("text"))
      val words = docs.unionByName(planted)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("h", xxhash64(col("w")))
      // vote per bit: +1 if set, -1 if clear; sign of the sum is the bit
      val bitCols = (0 until 16).map(b =>
        sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b"))
      words.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 16).map(b =>
            when(col(s"v$b") > 0, expr(s"shiftleft(1, $b)")).otherwise(0))
            .reduce(_ + _).as("simhash16"))
        .orderBy("doc_id")
    },

    // Embedding-cosine near-duplicate pairs through BANDED sign-LSH:
    // 32 hyperplanes → 4 bands × 8 bits; candidates = pairs sharing ≥1 whole
    // band (256 buckets per band, and `w` grows with the corpus — the old
    // 4-plane version was a CONSTANT 16-way partition, so every bucket grew
    // linearly with N and the intra-bucket join quadratically). Kept if
    // cosine ≥ 0.98. Planted exact copies agree on all bands → testable
    // recall; random corpus contributes no false pairs (cosine filter).
    QDef.noOracle("q_ext_embedding_neardup") { (s, d) =>
      graft.functions.VectorFunctions.registerOn(s)
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 25)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(planted).withColumn("sig", signLsh(s, 32))
      val bands = corpus
        .select(col("vec_id"), col("embedding"), lshBands(col("sig"), 4, 8).as("b"))
        .select(col("vec_id"), col("embedding"), col("b.band").as("band"),
          col("b.bv").as("bv"))
      val a = bands.select(col("band"), col("bv"), col("vec_id").as("id_a"),
        col("embedding").as("ea"))
      val b = bands.select(col("band"), col("bv"), col("vec_id").as("id_b"),
        col("embedding").as("eb"))
      // self-join on (band, band-sig): shuffle-native candidate generation,
      // then one groupBy dedupes pairs that collide on several bands
      a.join(b, Seq("band", "bv"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", round(
          expr("float_dot(ea, eb)") /
            (sqrt(expr("float_dot(ea, ea)")) * sqrt(expr("float_dot(eb, eb)"))), 6))
        .filter(col("cos") >= 0.98)
        .groupBy("id_a", "id_b").agg(first(col("cos")).as("cos_sim"))
        .orderBy("id_a", "id_b")
    },

    // Same top-k as q_ext_cosine_topk but through the native codegen'd
    // FloatDot expression instead of interpreted zip_with/aggregate lambdas
    // (same summation order → bit-identical results → same oracle). This is
    // the hot-path variant a 100 TB similarity scan would run.
    QDef(
      "q_ext_cosine_topk_native",
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |  round(${duckDot("v.embedding", "q.qe")} /
         |        (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}), 6) AS cos_sim
         |FROM embeddings v, q
         |WHERE v.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      graft.functions.VectorFunctions.registerOn(s)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(expr("float_dot(embedding, qe)") /
            (sqrt(expr("float_dot(embedding, embedding)")) *
             sqrt(expr("float_dot(qe, qe)"))), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    },

    // ANN scale path: banded sign-LSH probe. 32 hyperplanes → 4 bands × 8
    // bits; the search touches only vectors sharing ≥1 band signature with
    // the query (~4/256 of the corpus, and `w` tunes that fraction DOWN as N
    // grows — the old monolithic 4-bit probe was a fixed 1/16) before
    // brute-forcing cosine inside the candidate set. Recall is traded
    // (classic LSH), so no oracle — ModuleSpecs pins the structural contract
    // (every candidate shares a band, ordering correct).
    QDef.noOracle("q_ext_cosine_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d).withColumn("sig", signLsh(s, 32))
      val bands = emb
        .select(col("vec_id"), col("embedding"), lshBands(col("sig"), 4, 8).as("b"))
        .select(col("vec_id"), col("embedding"), col("b.band").as("band"),
          col("b.bv").as("bv"))
      // the probe side is 4 tiny rows (one per band of the query signature)
      val q = bands.filter(col("vec_id") === 0).select(col("band"), col("bv"))
      val qe = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      bands.filter(col("vec_id") =!= 0)
        .join(broadcast(q), Seq("band", "bv"))
        .groupBy("vec_id").agg(first(col("embedding")).as("embedding"),
          count(lit(1)).as("shared_bands"))
        .crossJoin(broadcast(qe))
        .select(col("vec_id"), col("shared_bands"),
          round(dot("embedding", "qe") / (norm2("embedding") * norm2("qe")), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    },

    // ANN scale path #2: IVF (inverted-file) index. Coarse quantizer = 8
    // deterministic "centroid" vectors (hash-order sample — production swaps
    // in k-means iterates; the INDEX STRUCTURE is what's exercised). Build:
    // every vector is assigned to its max-dot-product centroid with a
    // map-side-combined max_by (corpus never shuffles ×K — the partial agg
    // reduces to one row per vector before the exchange). Search: the query
    // resolves its own cell, then brute-forces cosine inside that cell only
    // (~1/K of the corpus). Fully deterministic → full DuckDB oracle, unlike
    // the sign-LSH variant.
    QDef(
      "q_ext_cosine_ivf",
      s"""WITH $ivfSqlCtes
         |SELECT v.vec_id, v.cid AS cell,
         |  round(${duckDot("v.embedding", "q.qe")} /
         |        (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}), 6) AS cos_sim
         |FROM cell v, q, qcell
         |WHERE v.cid = qcell.qcid AND v.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin) { (s, d) =>
      def fdot(a: String, b: String) = call_function("float_dot", col(a), col(b))
      val IvfIndex(_, cell, q, qcell) = ivfIndex(s, d)
      cell.filter(col("vec_id") =!= 0)
        .join(broadcast(qcell), col("cid") === col("qcid"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("cid").as("cell"),
          round(fdot("embedding", "qe") /
            (sqrt(fdot("embedding", "embedding")) * sqrt(fdot("qe", "qe"))), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    },

    // ANN EVALUATION: recall@10 of the IVF path against the exact
    // brute-force top-10 for the same query — the measurement loop every
    // ANN deployment needs, at two probe settings of the SAME shared index
    // (one annRecall definition, see above): probe-1 is the honest low-cost
    // trade-off; probe-2 searches ~2/K of the corpus and the ModuleSpecs
    // invariant asserts its recall never loses to probe-1 — the
    // recall/compute dial demonstrated and oracle-pinned end to end.
    annRecall("q_ext_ann_recall", probes = 1),
    annRecall("q_ext_ann_recall_probe2", probes = 2),

    // k-NN JOIN: top-3 neighbors for EACH of 5 query vectors at once — the
    // batch version of similarity search (dedup candidates, retrieval eval
    // sets). The grouped top-k runs through the bounded TopKPairs aggregate:
    // per (query, candidate) scores never sort globally; each query keeps an
    // O(k) heap, combined map-side. Candidate space at scale would be
    // LSH/IVF-bucketed first (see the variants above); here it is the full
    // cross product, which is exactly what the windowed oracle replays.
    QDef(
      "q_ext_knn_join",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |s AS (SELECT q.qid, v.vec_id,
         |        ${duckDot("v.embedding", "q.qe")} /
         |        (${duckNorm("v.embedding")} * ${duckNorm("q.qe")}) AS cs
         |      FROM embeddings v, q WHERE v.vec_id >= 5)
         |SELECT qid, vec_id, round(cs, 6) AS cos_sim FROM (
         |  SELECT qid, vec_id, cs,
         |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rn
         |  FROM s) t
         |WHERE rn <= 3 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin) { (s, d) =>
      graft.functions.VectorFunctions.registerOn(s)
      graft.functions.TopKFunctions.registerOn(s)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      emb.filter(col("vec_id") >= 5)
        .crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          (call_function("float_dot", col("embedding"), col("qe")) /
            (sqrt(call_function("float_dot", col("embedding"), col("embedding"))) *
             sqrt(call_function("float_dot", col("qe"), col("qe"))))).as("cs"))
        .groupBy("qid")
        .agg(expr("topk_pairs(cs, vec_id, 3)").as("tk"))
        .select(col("qid"), explode(col("tk")).as("t"))
        .select(col("qid"), col("t.id").as("vec_id"),
          round(col("t.score"), 6).as("cos_sim"))
        .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
    },

    QDef(
      "q_ext_multimodal_cols",
      s"""SELECT d.doc_id, d.lang, e.label,
         |  round(${duckNorm("e.embedding")}, 6) AS vnorm
         |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |WHERE e.label < 5 AND d.text LIKE '%data%'
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val emb  = Tables.embeddings(s, d)
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .filter(col("label") < 5 && col("text").like("%data%"))
        .select(col("doc_id"), col("lang"), col("label"),
          round(norm2("embedding"), 6).as("vnorm"))
        .orderBy("doc_id")
    },

    // Corpus mean-centering — the cross-row vector reduction every
    // embedding pipeline runs before PCA/whitening/index training, and the
    // op a naive implementation gets ORDER-DEPENDENT (a per-dimension
    // double sum over the corpus differs run-to-run under different
    // partition merge orders). Here each element's contribution is
    // floor-quantized ONCE to integer nanos and the 64 per-dimension sums
    // accumulate as exact longs in a SINGLE aggregation pass (64 agg
    // exprs, map-side combined — the q_ext_minhash_neardup discipline, not
    // a dims explode); the 1-row centroid broadcasts back and the per-
    // vector distance-to-centroid folds left in the fixed dimension order,
    // so both engines evaluate the identical FP tree bit-for-bit.
    //
    // Range: |Σ nanos| ≤ 2^63 needs n·1e9 < 9.2e18 per dimension for
    // unit-scale elements — ~9e9 vectors; shard the sum past that (the
    // X.dsum rationale).
    QDef(
      "q_ext_embed_center",
      embedCenterSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val g = emb.agg(count(lit(1)).as("n"), nanoSumExprs(): _*)
      val mu = muArrayExpr.as("mu")
      emb.crossJoin(broadcast(g.select(mu)))
        .select(col("vec_id"), col("label"),
          sqrt(expr("aggregate(zip_with(embedding, mu, " +
            "(x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)), " +
            "0D, (acc, v) -> acc + v)")).as("dist_center"))
        .orderBy("vec_id")
    },

    // K-means (Lloyd's) clustering step over the embedding corpus — seed
    // with the IVF-style md5-ordered K=8 centroids, assign by argmax dot
    // (the q_ext_cosine_ivf contract), UPDATE each centroid to its
    // cluster's exact mean (64 per-dim nano-quantized long sums per
    // cluster, integer-div means — the q_ext_embed_center contract), then
    // re-assign against the updated centroids. Every reduction is integer
    // or argmax, so the full clustering step is bit-deterministic and
    // oracle-verifiable — the thing a naive double-mean k-means cannot be.
    //
    // 100 TB posture: both assignment passes are broadcast(K rows) map-side
    // argmax (partial max_by before any exchange); the update is one
    // groupBy(cid) whose 64 long sums combine map-side; nothing
    // corpus-sized ever shuffles except the K-keyed partial rows. More
    // Lloyd rounds = repeat the same two stages; K only changes the
    // broadcast size.
    QDef(
      "q_ext_kmeans",
      kmeansSql) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val (_, a1) = argmaxCells(emb)
      val m1 = a1.groupBy("cid").agg(count(lit(1)).as("n"), nanoSumExprs(): _*)
        .select(col("cid"), muArrayExpr.as("mu"))
      emb.crossJoin(broadcast(m1))
        .withColumn("dp", expr("aggregate(zip_with(embedding, mu, " +
          "(x, m) -> CAST(x AS DOUBLE) * m), 0D, (acc, v) -> acc + v)"))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cid"), col("dp")),
          struct(col("dp"), (-col("cid")).as("nc"))).as("w"))
        .select(col("vec_id"), col("w.cid").as("cid"),
          round(col("w.dp"), 6).as("sim"))
        .orderBy("vec_id")
    },

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    // cluster the embedding corpus, then prune near-identical vectors
    // WITHIN each cluster only — the clustering turns an O(N²) all-pairs
    // cosine scan into K independent O((N/K)²) problems. Keep rule here is
    // the order-independent "dominated" form (drop v iff some u < v in the
    // same cluster has cos(u,v) > τ), which unlike the paper's greedy chain
    // is deterministic under any evaluation order and exactly expressible
    // in SQL. 25 planted near-copies (vec_id + 1,000,000 = original with
    // +0.01 on dim 1, cos ≈ 0.9999) verify true dups land in the same
    // cluster and get dropped; τ = 0.9 is far from the random-pair cosine
    // mass (|cos| ≲ 0.4 at 64 dims) so the flag is never boundary-sensitive.
    //
    // 100 TB posture: K is THE scale knob — SemDeDup runs LAION-scale with
    // K ≈ 50,000 precisely so N/K stays constant; per-cluster pair count
    // (and per-task CPU, the q_ext_edit_distance lesson) then stays bounded
    // while the cluster count supplies the parallelism. Assignment is the
    // shared broadcast-argmax contract (map-side max_by, K-row broadcast);
    // only (cid)-keyed rows shuffle for the intra-cluster join.
    QDef(
      "q_ext_semdedup",
      semdedupSql) { (s, d) =>
      graft.functions.VectorFunctions.registerOn(s)
      def fdot(a: String, b: String) =
        call_function("float_dot", col(a), col(b))
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      // Planted near-copies: +0.01 on dimension 1, double add then one
      // cast back to float — the identical FP tree as the oracle's CASE.
      val planted = emb.filter(col("vec_id") < 25)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> IF(i = 0, " +
            "CAST(CAST(x AS DOUBLE) + 0.01 AS FLOAT), x))").as("embedding"))
      val corpus = emb.unionByName(planted)
      val (_, cell) = argmaxCells(corpus)
      val l = cell.select(col("cid"), col("vec_id").as("lid"),
        col("embedding").as("le"))
      val r = cell.select(col("cid"), col("vec_id").as("rid"),
        col("embedding").as("re"))
      val dom = l.join(r, Seq("cid"))
        .filter(col("lid") < col("rid"))
        .withColumn("cs", fdot("le", "re") /
          (sqrt(fdot("le", "le")) * sqrt(fdot("re", "re"))))
        .filter(col("cs") > 0.9)
        .groupBy(col("rid").as("vec_id")).agg(min(col("lid")).as("dup_of"))
      cell.select("vec_id", "cid").join(dom, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"), col("dup_of"),
          col("dup_of").isNull.as("kept"))
        .orderBy("vec_id")
    },

    // Distributed power iteration for the corpus' top principal direction —
    // the first step of PCA/whitening over an embedding table, GRAM-FREE:
    // v' = (Σᵢ xᵢ·(xᵢ·v)) / n needs only a broadcast of the 64-float v and
    // ONE map-side-combined aggregation per round (64 long sums), never the
    // 64×64 covariance matrix and never a corpus shuffle. Two rounds
    // unrolled from v₀ = (1/8,…,1/8); each per-vector contribution
    // x_d·(x·v) floor-quantizes ONCE to integer nanos (the
    // q_ext_embed_center contract) so the reduction is an exact long sum —
    // bit-deterministic under any partitioning, hence fully oracle-able.
    // Output: the un-normalized round-2 direction as integer nanos per
    // dimension (normalization is a driver-side scalar; keeping the raw
    // longs keeps the contract exact).
    //
    // 100 TB posture: per round = K-free broadcast(1 row) + one linear agg;
    // more rounds (to convergence) repeat the same stage. |Σ nanos| bounds
    // as in q_ext_embed_center (~9e9 vectors per dim before sharding).
    // Product quantization (Jégou et al., the PQ in IVF-PQ): split each
    // 64-dim vector into 8 subspaces of 8 dims; encode each subspace as the
    // id of its nearest codebook entry. 256 bytes of floats become 8 codes —
    // the 32× compression that makes billion-vector ANN indexes fit in
    // memory at 100 TB corpus scale. Codebook here = the md5-ordered
    // 16-vector sample (the shared seeding contract; production would
    // k-means each subspace with the q_ext_kmeans machinery). Ties break
    // (dist ASC, cid ASC) via a lexicographic struct-min — deterministic,
    // hence fully oracle-able; `err` is the exact reconstruction error
    // (sum of the 8 winning subspace distances).
    //
    // 100 TB posture: the 16-row codebook broadcasts; distances evaluate
    // map-side in the scan stage; the ONLY shuffle is the vec_id groupBy
    // whose 16 struct-min aggregates combine map-side. Codebook size and
    // subspace count are constants — the plan is one linear pass.
    QDef(
      "q_ext_pq_encode",
      pqEncodeSql) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      pqMins(emb, pqCodebook(emb))
        .select(Seq(col("vec_id")) ++
          (1 to 8).map(sub => col(s"m$sub.cid").as(s"code$sub")) :+
          round((1 to 8).map(sub => col(s"m$sub.d$sub"))
            .reduce(_ + _), 6).as("err"): _*)
        .orderBy("vec_id")
    },

    // IVF-PQ search — the two shared contracts composed into the actual
    // billion-scale ANN architecture (FAISS's IndexIVFPQ): (1) probe the
    // query's IVF cell (argmax contract — searches ~1/K of the corpus);
    // (2) rank the cell's candidates by ASYMMETRIC DISTANCE: approx(v) =
    // Σ_s adc(code_s(v)) where the 8×16 ADC table holds exact
    // query-to-codebook subspace distances, so candidates are compared
    // from their 8-byte codes alone; (3) exact-rerank the approx top-20
    // into the final top-10. Every stage deterministic → full oracle.
    //
    // 100 TB posture: this is WHY pq_encode exists — the scan that ranks a
    // cell touches only codes (8 B/vector, not 256 B); the ADC table is
    // 128 doubles broadcast; only the top-20 survivors ever load their
    // full vectors for the rerank. Cell probe + code scan + bounded
    // rerank: nothing corpus-sized shuffles at any stage.
    QDef(
      "q_ext_ivfpq_search",
      ivfpqSql) { (s, d) =>
      graft.functions.VectorFunctions.registerOn(s)
      val IvfIndex(_, cell, q, qcell) = ivfIndex(s, d)
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val cb = pqCodebook(emb)
      val cand = cell.filter(col("vec_id") =!= 0)
        .join(broadcast(qcell), col("cid") === col("qcid"))
        .select("vec_id", "embedding")
      val codes = pqMins(cand, cb).select(Seq(col("vec_id")) ++
        (1 to 8).map(i => col(s"m$i.cid").as(s"code$i")): _*)
      // ADC table: exact query-to-codebook distance per subspace (16 rows)
      val adc = cb.crossJoin(broadcast(q.select(col("qe").as("embedding"))))
        .select(Seq(col("cid")) ++
          (1 to 8).map(sub => pqSubDist(sub).as(s"t$sub")): _*)
      val approx = (1 to 8).foldLeft(codes) { (df, i) =>
          df.join(broadcast(adc.select(col("cid").as(s"code$i"), col(s"t$i"))),
            Seq(s"code$i"))
        }
        .select(col("vec_id"),
          (1 to 8).map(i => col(s"t$i")).reduce(_ + _).as("approx_dist"))
      val top20 = approx.orderBy(col("approx_dist"), col("vec_id")).limit(20)
      top20.join(emb, Seq("vec_id")).crossJoin(broadcast(q))
        .select(col("vec_id"), col("approx_dist"),
          expr("aggregate(zip_with(embedding, qe, " +
            "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
            "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (a, v) -> a + v)")
            .as("exact_dist"))
        .orderBy(col("exact_dist"), col("vec_id")).limit(10)
        .select(col("vec_id"), round(col("approx_dist"), 6).as("approx_dist"),
          round(col("exact_dist"), 6).as("exact_dist"))
    },

    QDef(
      "q_ext_power_iter",
      powerIterSql) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("embedding")
      // one power-iteration round: dot against the broadcast v, then the
      // 64 exact dp-weighted nano sums (returns the (n, s1..s64) row)
      def round(v: DataFrame): DataFrame =
        emb.crossJoin(broadcast(v))
          .withColumn("dp", expr("aggregate(zip_with(embedding, v, " +
            "(x, m) -> CAST(x AS DOUBLE) * m), 0D, (acc, t) -> acc + t)"))
          .agg(count(lit(1)).as("n"), nanoSumExprs(Some(col("dp"))): _*)
      val v0 = s.range(1)
        .select(array((1 to 64).map(_ => lit(0.125d)): _*).as("v"))
      val v1 = round(v0).select(muArrayExpr.as("v"))
      val g2 = round(v1)
      g2.select(posexplode(
          array((1 to 64).map(i => expr(s"s$i div n")): _*)))
        .select(col("pos").cast("long").as("dim"), col("col").as("v_nano"))
        .orderBy("dim")
    },
  )

  /** DuckDB oracle for q_ext_kmeans: seed selection, argmax assignment,
    * nano-quantized centroid update and re-assignment — the identical
    * integer/argmax contract as the Spark program, unrolled as CTEs. */
  private def kmeansSql: String = {
    val dp2 = "list_sum(list_transform(range(1, 65), i -> CAST(v.embedding[i] AS DOUBLE) * m.mu[i]))"
    s"""WITH ${argmaxCtes("embeddings")},
       |m1 AS (SELECT cid, count(*) AS n, ${duckNanoSums()} FROM cell GROUP BY cid),
       |mu AS (SELECT cid, $duckNanoMeans AS mu FROM m1),
       |r2 AS (SELECT v.vec_id, m.cid, $dp2 AS dp, row_number() OVER (
       |         PARTITION BY v.vec_id ORDER BY $dp2 DESC, m.cid) AS rn
       |       FROM embeddings v, mu m)
       |SELECT vec_id, cid, round(dp, 6) AS sim FROM r2 WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }

  /** DuckDB oracle for q_ext_pq_encode: the shared [[pqCodesCtes]] contract
    * over the full corpus, same left-assoc error sum. */
  private def pqEncodeSql: String = {
    val errExpr = (1 to 8).map(s0 => s"d$s0").mkString(" + ")
    s"""WITH ${pqCodesCtes("embeddings")}
       |SELECT vec_id, code1, code2, code3, code4, code5, code6, code7, code8,
       |  round($errExpr, 6) AS err
       |FROM codes ORDER BY vec_id""".stripMargin
  }

  /** DuckDB oracle for q_ext_ivfpq_search: the shared IVF probe + the
    * shared PQ codes over the probed cell + the same ADC table, approx
    * top-20, exact rerank to top-10. */
  private def ivfpqSql: String = {
    def adcDist(sub: Int) = {
      // same decomposed arithmetic as the Spark-side pqSubDist ADC table
      val lo = 8 * sub - 7
      def d(a: String, b: String) =
        s"list_sum(list_transform(range($lo, ${lo + 8}), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
      s"${d("q.qe", "q.qe")} + ${d("c.ce", "c.ce")} - 2 * ${d("q.qe", "c.ce")}"
    }
    val tcols = (1 to 8).map(s0 => s"(${adcDist(s0)}) AS t$s0").mkString(", ")
    val adcJoins = (1 to 8).map(s0 =>
      s"JOIN adc a$s0 ON a$s0.cid = k.code$s0").mkString(" ")
    val approxExpr = (1 to 8).map(s0 => s"a$s0.t$s0").mkString(" + ")
    val exactL2 = "list_sum(list_transform(range(1, 65), " +
      "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE)) * " +
      "(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))))"
    s"""WITH $ivfSqlCtes,
       |cand AS (SELECT v.vec_id, v.embedding FROM cell v, qcell
       |         WHERE v.cid = qcell.qcid AND v.vec_id <> 0),
       |${pqCodesCtes("cand")},
       |adc AS (SELECT c.cid, $tcols FROM cb c, q),
       |ap AS (SELECT k.vec_id, $approxExpr AS approx_dist
       |       FROM codes k $adcJoins),
       |top20 AS (SELECT * FROM ap ORDER BY approx_dist, vec_id LIMIT 20),
       |ex AS (SELECT t.vec_id, t.approx_dist, $exactL2 AS exact_dist
       |       FROM top20 t JOIN embeddings e USING (vec_id), q)
       |SELECT vec_id, round(approx_dist, 6) AS approx_dist,
       |  round(exact_dist, 6) AS exact_dist
       |FROM ex ORDER BY exact_dist, vec_id LIMIT 10""".stripMargin
  }

  /** DuckDB oracle for q_ext_power_iter: the identical two unrolled
    * Gram-free rounds — same left-fold dot, same per-contribution nano
    * floor-quantization, same integer-div means. */
  private def powerIterSql: String = {
    val v0 = (1 to 64).map(_ => "0.125").mkString("[", ", ", "]")
    val dot0 = s"list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (${v0}::DOUBLE[])[i]))"
    val dot1 = "list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * w.v[i]))"
    val sums = duckNanoSums(Some("dp"))
    val nanos = (1 to 64).map(i => s"s$i // n").mkString("[", ", ", "]")
    s"""WITH d1 AS (SELECT e.embedding, $dot0 AS dp FROM embeddings e),
       |g1 AS (SELECT count(*) AS n, $sums FROM d1),
       |v1 AS (SELECT $duckNanoMeans AS v FROM g1),
       |d2 AS (SELECT e.embedding, $dot1 AS dp FROM embeddings e, v1 w),
       |g2 AS (SELECT count(*) AS n, $sums FROM d2),
       |arr AS (SELECT $nanos AS a FROM g2)
       |SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(a[i] AS BIGINT) AS v_nano
       |FROM arr, unnest(range(1, 65)) AS t(i) ORDER BY dim""".stripMargin
  }

  /** DuckDB oracle for q_ext_semdedup: the same planted corpus, the same
    * md5-seeded centroids and argmax assignment, the same dominated-pair
    * rule — every cosine the identical left-fold double tree as FloatDot. */
  private def semdedupSql: String = {
    val cos = s"${duckDot("l.embedding", "r.embedding")} / " +
      s"(${duckNorm("l.embedding")} * ${duckNorm("r.embedding")})"
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, list_transform(range(1, 65),
       |    i -> CASE WHEN i = 1
       |              THEN CAST(CAST(embedding[i] AS DOUBLE) + 0.01 AS FLOAT)
       |              ELSE embedding[i] END)
       |  FROM embeddings WHERE vec_id < 25),
       |${argmaxCtes("corpus")},
       |dom AS (SELECT r.vec_id AS vec_id, min(l.vec_id) AS dup_of
       |        FROM cell l JOIN cell r
       |          ON l.cid = r.cid AND l.vec_id < r.vec_id
       |        WHERE $cos > 0.9 GROUP BY r.vec_id)
       |SELECT cell.vec_id, cell.cid, dom.dup_of, dom.dup_of IS NULL AS kept
       |FROM cell LEFT JOIN dom ON cell.vec_id = dom.vec_id
       |ORDER BY cell.vec_id""".stripMargin
  }

  /** DuckDB oracle for q_ext_embed_center: the same 64 exact nano sums in
    * one aggregation, the same integer-div means, the same left-fold
    * distance. */
  private def embedCenterSql: String = {
    val sums = duckNanoSums()
    val means = duckNanoMeans
    s"""WITH g AS (SELECT count(*) AS n, $sums FROM embeddings),
       |m AS (SELECT $means AS mu FROM g)
       |SELECT vec_id, label,
       |  sqrt(list_sum(list_transform(range(1, 65),
       |    i -> (CAST(embedding[i] AS DOUBLE) - mu[i]) * (CAST(embedding[i] AS DOUBLE) - mu[i])))) AS dist_center
       |FROM embeddings, m ORDER BY vec_id""".stripMargin
  }
}
