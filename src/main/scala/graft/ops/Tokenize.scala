package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Tokenizer-construction operators (round-5 north-star additions): the
  * corpus-statistics passes a BPE-style tokenizer build and audit needs.
  *
  * Scale posture mirrors graft.ops.Pipeline: the only corpus-sized stage is
  * the word explode, whose aggregation keys are WORDS (vocabulary-bounded
  * with map-side combine) — every downstream frame is vocab-sized, so the
  * pair-counting / coverage math costs the same at 100 TB as the existing
  * vocab_topk pass.
  */
object Tokenize {

  val all: Seq[QDef] = Seq(
    // One BPE training iteration (Sennrich et al. 2016): count adjacent
    // symbol pairs across the corpus (weighted by word frequency) and rank
    // the merge candidates. This is the inner loop of every BPE/WordPiece
    // vocabulary build; one iteration is exactly representative (the loop
    // re-runs this count after each merge) and — being pure integer
    // counting — fully oracle-able.
    //
    // 100 TB posture: corpus explode → word-keyed count (vocab-bounded,
    // map-side combined); the pair explode runs over DISTINCT words only
    // (31 rows here, ≤ a few million for real corpora), never the corpus.
    QDef(
      "q_ext_bpe_merge",
      """WITH wf AS (
        |  SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |    FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w),
        |pp AS (
        |  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair, wc
        |  FROM wf)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS n_pair
        |FROM pp GROUP BY pair ORDER BY n_pair DESC, pair LIMIT 10""".stripMargin) { (s, d) =>
      val wf = Tables.documents(s, d)
        .select(explode(TextOps.words).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
        .filter(length(col("w")) >= 2)
      // sequence(1, len-1) is safe: len >= 2 is guaranteed by the filter
      // (Spark's sequence STEPS DOWN when start > stop, so an unguarded
      // length-1 word would fabricate pairs instead of skipping)
      wf.select(col("wc"),
          explode(expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum(col("wc")).as("n_pair"))
        .orderBy(col("n_pair").desc, col("pair"))
        .limit(10)
    },

    // Vocabulary-coverage audit: per-document out-of-vocabulary token rate
    // against the corpus top-20 vocabulary (count desc, word tiebreak — the
    // vocab_topk contract at a coverage-relevant cutoff). The tokenizer-audit
    // dual of q_ext_vocab_topk: topk says what the vocabulary IS, this says
    // what it MISSES per document.
    QDef(
      "q_ext_oov_rate",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents),
        |vocab AS (
        |  SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w
        |                 ORDER BY c DESC, w LIMIT 20)),
        |agg AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |         sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON t.w = v.w GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_oov AS BIGINT) AS n_oov,
        |       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
        |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(20)
        .select(col("w"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1).otherwise(0)).as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },

    // Distinct-n diversity audit (the corpus-level generation-diversity
    // metric): per source, the distinct-1 and distinct-2 ratios — share of
    // unique unigrams/bigrams among all occurrences. Low distinct-n flags
    // templated/boilerplate sources before they flood a training mix; the
    // linear alternative to quadratic pairwise self-BLEU.
    //
    // 100 TB posture: two exploded streams aggregate keyed by source (the
    // distincts expand by (source, gram) — vocabulary-bounded per source);
    // no pair space anywhere.
    QDef(
      "q_ext_distinct_ngrams",
      """WITH w AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |           FROM documents),
        |uni AS (SELECT source, unnest(ws) AS g FROM w),
        |bi AS (SELECT source, unnest(list_transform(range(1, len(ws)),
        |         i -> ws[i] || ' ' || ws[i+1])) AS g
        |       FROM w WHERE len(ws) >= 2),
        |u AS (SELECT source, count(*) AS n_uni, count(DISTINCT g) AS d_uni
        |      FROM uni GROUP BY 1),
        |b AS (SELECT source, count(*) AS n_bi, count(DISTINCT g) AS d_bi
        |      FROM bi GROUP BY 1)
        |SELECT source, CAST(n_uni AS BIGINT) AS n_uni, CAST(d_uni AS BIGINT) AS d_uni,
        |  CAST(n_bi AS BIGINT) AS n_bi, CAST(d_bi AS BIGINT) AS d_bi,
        |  CAST(d_uni AS DOUBLE) / n_uni AS distinct1,
        |  CAST(d_bi AS DOUBLE) / n_bi AS distinct2
        |FROM u JOIN b USING (source) ORDER BY source""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("source"), TextOps.words.as("ws"))
      val uni = w.select(col("source"), explode(col("ws")).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_uni"), countDistinct(col("g")).as("d_uni"))
      val bi = w.filter(size(col("ws")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))")).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bi"), countDistinct(col("g")).as("d_bi"))
      uni.join(bi, Seq("source"))
        .select(col("source"), col("n_uni"), col("d_uni"), col("n_bi"), col("d_bi"),
          (col("d_uni").cast("double") / col("n_uni")).as("distinct1"),
          (col("d_bi").cast("double") / col("n_bi")).as("distinct2"))
        .orderBy("source")
    },

    // Count-Min-Sketch heavy hitters: the corpus token frequencies estimated
    // through the CONSTANT-state `cms_sketch` aggregate (4×64 cells,
    // graft.functions.CmsSketch) and compared against the exact counts for
    // the top-10 words — est ≥ exact (the CMS admissibility guarantee) is
    // carried as an output column. The bucket hash is md5-derived in Column
    // expressions (shared with the oracle, which rebuilds the sketch
    // cell-for-cell in SQL), so the whole measurement is bit-deterministic.
    //
    // 100 TB posture: the sketch pass ships 2 KB per map partition — no
    // vocabulary shuffle at all; only the top-10 exact check (the
    // evaluation, not the production path) aggregates by word.
    QDef("q_ext_cms_heavy_hitters", Tokenize.cmsSql) { (s, d) =>
      graft.functions.CmsFunctions.registerOn(s)
      val toks = Tables.documents(s, d).select(explode(TextOps.words).as("w"))
      val sketch = toks
        .withColumn("bks", array((0 until 4).map(sparkBucket): _*))
        .agg(expr("cms_sketch(bks)").as("sk"))
      val top10 = toks.groupBy("w").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("w")).limit(10)
      top10.crossJoin(broadcast(sketch))
        .withColumn("cms_n", least((0 until 4).map(dd =>
          element_at(col("sk"), sparkBucket(dd) + lit(dd * 64 + 1))): _*))
        .select(col("w").as("word"), col("exact_n"), col("cms_n"),
          (col("cms_n") >= col("exact_n")).as("admissible"))
        .orderBy(col("exact_n").desc, col("word"))
    }
  )

  /** The ONE bucket-hash definition (both engines): depth-d bucket of word
    * `w` = (hexval(md5("d:w")[1])·16 + hexval(md5("d:w")[2])) mod 64. */
  private def sparkBucket(d: Int): org.apache.spark.sql.Column = expr(
    s"CAST((((instr('0123456789abcdef', substring(md5(concat('$d:', w)), 1, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substring(md5(concat('$d:', w)), 2, 1)) - 1)) % 64) AS INT)")

  private def duckBucket(dExpr: String, wExpr: String): String =
    s"((instr('0123456789abcdef', substring(md5($dExpr || ':' || $wExpr), 1, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substring(md5($dExpr || ':' || $wExpr), 2, 1)) - 1)) % 64"

  private def cmsSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |  FROM documents),
       |ds AS (SELECT unnest(range(0, 4)) AS d),
       |b AS (SELECT w, d, ${duckBucket("CAST(d AS VARCHAR)", "w")} AS bkt FROM toks, ds),
       |cells AS (SELECT d, bkt, count(*) AS c FROM b GROUP BY 1, 2),
       |top10 AS (SELECT w, count(*) AS exact_n FROM toks GROUP BY w
       |          ORDER BY exact_n DESC, w LIMIT 10),
       |est AS (
       |  SELECT b2.w, min(c.c) AS cms_n
       |  FROM (SELECT DISTINCT w, d, bkt FROM b WHERE w IN (SELECT w FROM top10)) b2
       |  JOIN cells c ON c.d = b2.d AND c.bkt = b2.bkt
       |  GROUP BY 1)
       |SELECT t.w AS word, CAST(t.exact_n AS BIGINT) AS exact_n,
       |  CAST(e.cms_n AS BIGINT) AS cms_n, e.cms_n >= t.exact_n AS admissible
       |FROM top10 t JOIN est e ON e.w = t.w
       |ORDER BY t.exact_n DESC, word""".stripMargin
}
