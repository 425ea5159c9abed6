package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Retrieval-scale vector operators (round-5 north-star additions): int8
  * scalar quantization (the 4× memory-compression path every large ANN
  * deployment runs before IVF/PQ), quantized asymmetric search, and MMR
  * diversified reranking.
  *
  * Exactness contract (graft.Core / graft-scale-lessons): quantization codes
  * are integers produced by a single-operation FP tree (sub, mul, div,
  * floor) that is bit-identical in Spark and DuckDB; score folds run in
  * fixed dimension order (zip_with/aggregate left fold ≡ DuckDB list_sum of
  * list_transform); every threshold/argmax compares floor-quantized integer
  * micros/nanos, never accumulated doubles.
  */
object Retrieval {

  /** Per-dimension corpus min/max (the SQ8 codebook): ONE aggregation pass,
    * 128 agg expressions, map-side combined; the result is a single row that
    * broadcasts back — the scalar-quantization analog of Ext's nano-sum
    * centroid contract. */
  private[graft] def statsRow(emb: DataFrame): DataFrame = {
    val aggs = (1 to 64).map(d =>
      min(expr(s"CAST(element_at(embedding, $d) AS DOUBLE)")).as(s"mn$d")) ++
      (1 to 64).map(d =>
        max(expr(s"CAST(element_at(embedding, $d) AS DOUBLE)")).as(s"mx$d"))
    emb.agg(aggs.head, aggs.tail: _*)
      .select(
        array((1 to 64).map(d => col(s"mn$d")): _*).as("mn"),
        array((1 to 64).map(d => col(s"mx$d")): _*).as("mx"))
  }

  private val duckStats: String = {
    val mns = (1 to 64).map(d => s"min(CAST(embedding[$d] AS DOUBLE))").mkString(", ")
    val mxs = (1 to 64).map(d => s"max(CAST(embedding[$d] AS DOUBLE))").mkString(", ")
    s"st AS (SELECT [$mns] AS mn, [$mxs] AS mx FROM embeddings)"
  }

  /** int8 code array: floor((x - mn) * 255 / (mx - mn)) clamped to 255.
    * A constant dimension (mx = mn) would need a CASE-to-0 guard; the
    * embeddings fixture (and any real embedding corpus) has none, and the
    * guard would bury the shared FP tree, so it is documented, not coded. */
  private[graft] val sparkCodes: Column = expr(
    "transform(sequence(1, 64), d -> CAST(least(255, floor(" +
      "(CAST(element_at(embedding, d) AS DOUBLE) - element_at(mn, d)) * 255.0D" +
      " / (element_at(mx, d) - element_at(mn, d)))) AS INT))")

  private val duckCodes: String =
    "list_transform(range(1, 65), d -> CAST(least(255, floor(" +
      "(CAST(embedding[d] AS DOUBLE) - mn[d]) * 255.0" +
      " / (mx[d] - mn[d]))) AS INT))"

  /** Asymmetric reconstruction dot: full-precision query vs dequantized
    * corpus codes, folded in fixed dimension order — with the code
    * expression INLINED rather than materializing a `cs` array first:
    * higher-order lambdas run interpreted, so the search scan pays
    * per-element lambda calls and one fused pass halves them. The inlined
    * code value is the identical int, so the fold is bit-identical to
    * encode-then-dot (the oracle keeps the readable two-stage form). */
  private val sparkAdcDotFused: Column = {
    val code = "CAST(least(255, floor((CAST(element_at(embedding, d) AS DOUBLE) - " +
      "element_at(mn, d)) * 255.0D / (element_at(mx, d) - element_at(mn, d)))) AS DOUBLE)"
    expr(
      "aggregate(sequence(1, 64), 0D, (acc, d) -> acc + " +
        "CAST(element_at(qe, d) AS DOUBLE) * (element_at(mn, d) + " +
        s"($code + 0.5D) * " +
        "(element_at(mx, d) - element_at(mn, d)) / 255.0D))")
  }

  private val duckAdcDot: String =
    "list_sum(list_transform(range(1, 65), d -> " +
      "CAST(qe[d] AS DOUBLE) * (mn[d] + (CAST(cs[d] AS DOUBLE) + 0.5) * " +
      "(mx[d] - mn[d]) / 255.0)))"

  /** Two-stage form of the reconstruction dot for callers that hold
    * PERSISTED code arrays (`cs`) rather than the raw embedding —
    * [[graft.examples.RetrievalFlow]] searches a stored index, where the
    * fused-from-embedding fold above does not apply. Value-identical to
    * [[sparkAdcDotFused]] over the codes [[sparkCodes]] produced. */
  private[graft] val adcDotFromCodes: Column = expr(
    "aggregate(sequence(1, 64), 0D, (acc, d) -> acc + " +
      "CAST(element_at(qe, d) AS DOUBLE) * (element_at(mn, d) + " +
      "(CAST(element_at(cs, d) AS DOUBLE) + 0.5D) * " +
      "(element_at(mx, d) - element_at(mn, d)) / 255.0D))")

  val all: Seq[QDef] = Seq(
    // Scalar quantization (SQ8): each float32 dimension maps to one byte
    // against the corpus per-dimension min/max grid — 4× compression before
    // any indexing. Output pins the full code array (md5 of the joined
    // codes), three sampled dimensions, and the exact nano-quantized
    // reconstruction SSE per vector.
    //
    // 100 TB posture: the stats pass is one map-side-combined aggregation
    // producing ONE row; encoding is map-only against the broadcast row.
    QDef(
      "q_ext_sq8_encode",
      s"""WITH $duckStats,
         |codes AS (
         |  SELECT vec_id, embedding, $duckCodes AS cs FROM embeddings, st)
         |SELECT vec_id, cs[1] AS c1, cs[32] AS c32, cs[64] AS c64,
         |  md5(array_to_string(cs, ',')) AS code_md5,
         |  CAST(floor(list_sum(list_transform(range(1, 65), d ->
         |    (CAST(embedding[d] AS DOUBLE) - (mn[d] + (CAST(cs[d] AS DOUBLE) + 0.5) * (mx[d] - mn[d]) / 255.0))
         |    * (CAST(embedding[d] AS DOUBLE) - (mn[d] + (CAST(cs[d] AS DOUBLE) + 0.5) * (mx[d] - mn[d]) / 255.0))
         |  )) * 1e9) AS BIGINT) AS sse_nano
         |FROM codes, st ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val recon = "(element_at(mn, d) + (CAST(element_at(cs, d) AS DOUBLE) + 0.5D) * " +
        "(element_at(mx, d) - element_at(mn, d)) / 255.0D)"
      emb.crossJoin(broadcast(statsRow(emb)))
        .withColumn("cs", sparkCodes)
        .select(
          col("vec_id"),
          expr("element_at(cs, 1)").as("c1"),
          expr("element_at(cs, 32)").as("c32"),
          expr("element_at(cs, 64)").as("c64"),
          md5(expr("concat_ws(',', transform(cs, x -> CAST(x AS STRING)))")
            .cast("binary")).as("code_md5"),
          floor(expr(
            "aggregate(sequence(1, 64), 0D, (acc, d) -> acc + " +
              s"(CAST(element_at(embedding, d) AS DOUBLE) - $recon) * " +
              s"(CAST(element_at(embedding, d) AS DOUBLE) - $recon))") * lit(1e9))
            .as("sse_nano"))
        .orderBy("vec_id")
    },

    // Quantized asymmetric search: rank the whole corpus by the
    // reconstruction dot against the full-precision query (vec_id = 0),
    // shortlist 20, exact-cosine rerank to 5 — the SQ8 face of the
    // shortlist-then-rerank contract q_ext_ivfpq_search established.
    //
    // 100 TB posture: the only broadcasts are the 1-row stats and the
    // 64-float query; ranking is a map-side fold + TakeOrderedAndProject;
    // the exact rerank touches 20 rows.
    QDef(
      "q_ext_sq8_search",
      s"""WITH $duckStats,
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |codes AS (
         |  SELECT vec_id, embedding, $duckCodes AS cs FROM embeddings, st),
         |scored AS (
         |  SELECT vec_id, embedding, $duckAdcDot AS adc
         |  FROM codes, st, q),
         |short AS (
         |  SELECT vec_id, embedding FROM scored ORDER BY adc DESC, vec_id LIMIT 20)
         |SELECT row_number() OVER (ORDER BY cm DESC, vec_id) AS rank, vec_id, cm AS cos_micro
         |FROM (
         |  SELECT vec_id,
         |    CAST(floor(${Ext.duckCosSql("embedding", "qe")} * 1e6) AS BIGINT) AS cm
         |  FROM short, q)
         |ORDER BY cm DESC, vec_id LIMIT 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe")))
      val shortlist = emb.crossJoin(broadcast(statsRow(emb))).crossJoin(q)
        .withColumn("adc", sparkAdcDotFused)
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(20)
        .select("vec_id", "embedding")
      import org.apache.spark.sql.expressions.Window
      val rer = shortlist.crossJoin(q)
        .withColumn("cm", floor(Ext.cosCol("embedding", "qe") * lit(1e6)))
        .select("vec_id", "cm")
        .orderBy(col("cm").desc, col("vec_id")).limit(5)
      rer.withColumn("rank",
          row_number().over(Window.orderBy(col("cm").desc, col("vec_id"))))
        .select(col("rank"), col("vec_id"), col("cm").as("cos_micro"))
        .orderBy(col("cm").desc, col("vec_id"))
    },

    // Grouped embedding pooling: per-source mean centroid over the corpus
    // embeddings (documents joined on id) through the ONE nano-sum contract
    // (Ext.nanoSumExprs — 64 floor-quantized long sums, map-side combined,
    // integer-div means). This is the "pool chunk embeddings back to a
    // parent key" op every retrieval pipeline runs after chunked encoding;
    // outputs stay scalar-exact (sampled dims + the L1 mass of the
    // centroid) so the whole reduction is integer arithmetic.
    //
    // 100 TB posture: ONE shuffle keyed by the group, 65 agg expressions
    // combining map-side; no embedding array ever crosses as a shuffle key.
    QDef(
      "q_ext_embed_pool",
      s"""WITH j AS (
         |  SELECT d.source, e.embedding FROM embeddings e
         |  JOIN documents d ON d.doc_id = e.vec_id),
         |agg AS (SELECT source, count(*) AS n, ${Ext.duckNanoSums()}
         |        FROM j GROUP BY source)
         |SELECT source, CAST(n AS BIGINT) AS n_vecs,
         |  CAST(s1 // n AS BIGINT) AS mu1_nano,
         |  CAST(s32 // n AS BIGINT) AS mu32_nano,
         |  CAST(s64 // n AS BIGINT) AS mu64_nano,
         |  CAST(${(1 to 64).map(i => s"abs(s$i // n)").mkString(" + ")} AS BIGINT) AS l1_nano
         |FROM agg ORDER BY source""".stripMargin) { (s, d) =>
      val j = Tables.embeddings(s, d).join(
        Tables.documents(s, d).select(col("doc_id").as("vec_id"), col("source")),
        Seq("vec_id"))
      val aggs = count(lit(1)).as("n") +: Ext.nanoSumExprs()
      j.groupBy("source").agg(aggs.head, aggs.tail: _*)
        .select(col("source"), col("n").as("n_vecs"),
          expr("s1 div n").as("mu1_nano"),
          expr("s32 div n").as("mu32_nano"),
          expr("s64 div n").as("mu64_nano"),
          (1 to 64).map(i => abs(expr(s"s$i div n")))
            .reduce(_ + _).as("l1_nano"))
        .orderBy("source")
    },

    // MMR diversified rerank (Carbonell & Goldstein 1998): from the exact
    // top-20 cosine candidates of query 0, greedily pick 5 maximizing
    // 0.7·relevance − 0.3·max-similarity-to-already-picked. The greedy
    // argmax runs on floor-quantized integer micros (scaled ×10 to keep the
    // 7/3 split integral), with vec_id tiebreak, so the pick sequence is
    // bit-deterministic and the 5 unrolled rounds oracle exactly — the same
    // unrolled-CTE pattern as q_ext_kmeans/q_ext_pagerank.
    //
    // 100 TB posture: the candidate shortlist (top-20) comes from the exact
    // cosine scan (or any ANN path above it); every greedy round is an
    // argmax over ≤20 rows joined against ≤4 picked vectors — constant work
    // after the shortlist, regardless of corpus size.
    QDef("q_ext_mmr_rerank", Retrieval.mmrSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe")))
      val cand = emb.crossJoin(q)
        .withColumn("rel", floor(Ext.cosCol("embedding", "qe") * lit(1e6)).cast("long"))
        .select("vec_id", "embedding", "rel")
        .orderBy(col("rel").desc, col("vec_id")).limit(20)
        .localCheckpoint(true)
      // pairwise candidate similarity in integer micros (20×20 rows)
      val sim = cand.select(col("vec_id").as("a"), col("embedding").as("ea"), col("rel").as("rel_a"))
        .crossJoin(cand.select(col("vec_id").as("b"), col("embedding").as("eb")))
        .withColumn("sm", floor(Ext.cosCol("ea", "eb") * lit(1e6)).cast("long"))
        .select("a", "rel_a", "b", "sm")
        .localCheckpoint(true)
      var picked = cand.orderBy(col("rel").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), lit(1).as("round"))
      for (r <- 2 to 5) {
        // score every unpicked candidate: 7·rel − 3·max sim to picked
        val next = sim.join(picked.select(col("vec_id").as("b")), Seq("b"))
          .groupBy(col("a"), col("rel_a"))
          .agg(max(col("sm")).as("maxsim"))
          .join(picked.select(col("vec_id").as("a")), Seq("a"), "left_anti")
          .withColumn("score", lit(7L) * col("rel_a") - lit(3L) * col("maxsim"))
          .orderBy(col("score").desc, col("a")).limit(1)
          .select(col("a").as("vec_id"), lit(r).as("round"))
        picked = picked.unionByName(next)
      }
      picked.join(cand.select("vec_id", "rel"), Seq("vec_id"))
        .select(col("round"), col("vec_id"), col("rel").as("rel_micro"))
        .orderBy("round")
    }
  )

  /** DuckDB side of the MMR greedy unroll: candidate shortlist + pairwise
    * integer-micro similarity CTEs, then five rounds r1..r5 each picking
    * argmax(7·rel − 3·max sim to picked, vec_id tiebreak). */
  private def mmrSql: String = {
    val cos = Ext.duckCosSql("c.embedding", "q.qe")
    val pairCos = Ext.duckCosSql("x.embedding", "y.embedding")
    val rounds = (2 to 5).map { r =>
      val prev = (1 until r).map(i => s"SELECT vec_id FROM r$i").mkString(" UNION ALL ")
      s"""r$r AS (
         |  SELECT s.a AS vec_id FROM sim s
         |  JOIN ($prev) p ON s.b = p.vec_id
         |  WHERE s.a NOT IN ($prev)
         |  GROUP BY s.a, s.rel_a
         |  ORDER BY 7 * s.rel_a - 3 * max(s.sm) DESC, s.a LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(r =>
      s"SELECT $r AS round, vec_id FROM r$r").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT c.vec_id, c.embedding,
       |    CAST(floor($cos * 1e6) AS BIGINT) AS rel
       |  FROM embeddings c, q ORDER BY rel DESC, c.vec_id LIMIT 20),
       |sim AS (
       |  SELECT x.vec_id AS a, x.rel AS rel_a, y.vec_id AS b,
       |    CAST(floor($pairCos * 1e6) AS BIGINT) AS sm
       |  FROM cand x, cand y),
       |r1 AS (SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT p.round, p.vec_id, c.rel AS rel_micro
       |FROM ($out) p JOIN cand c USING (vec_id) ORDER BY p.round""".stripMargin
  }
}
