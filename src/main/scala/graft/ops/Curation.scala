package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators (round 3 of the north-star LLM-data-pipeline
  * family): near-dup cluster resolution, relevance scoring, benchmark
  * decontamination, policy-ranked canonical selection.
  *
  * Scale rules follow graft.ops.Ext / Pipeline: shuffle keys are ids or
  * hashes (never document bodies), small sides broadcast, iteration state
  * stays distributed (the connected-components loop's only driver value is a
  * one-row convergence aggregate, never data rows).
  */
object Curation {

  val all: Seq[QDef] = Seq(
    // Connected components over a near-duplicate edge relation — the step
    // that turns pairwise near-dup CANDIDATES (minhash/simhash/embedding
    // output) into dedup CLUSTERS with one canonical id per cluster. The
    // algorithm is min-label propagation: every node starts labeled with its
    // own id; each round every node takes the min label among itself and its
    // neighbors; fixpoint = per-component min id. Deterministic (unique
    // fixpoint) → full DuckDB oracle via a recursive CTE. The synthetic edge
    // rule (doc → doc·2) stands in for a near-dup pair list and builds
    // genuinely multi-hop chains, so convergence takes several rounds — a
    // single groupBy could not fake it.
    //
    // 100 TB posture: each round is one shuffle join (edges ⋈ labels) + one
    // min-groupBy — the standard distributed CC loop (GraphX/GraphFrames do
    // the same). Rounds = graph diameter (near-dup clusters are shallow);
    // the convergence check is a ONE-ROW decimal aggregate, not a collect.
    QDef(
      "q_ext_dedup_clusters",
      """WITH RECURSIVE fwd AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a
        |  JOIN documents b ON b.doc_id = a.doc_id * 2 AND a.doc_id > 0),
        |e AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
        |cc AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM documents
        |  UNION
        |  SELECT e.dst AS id, cc.comp AS comp FROM cc JOIN e ON cc.id = e.src)
        |SELECT id AS doc_id, min(comp) AS component FROM cc
        |GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ids = Tables.documents(s, d).select(col("doc_id").as("id"))
      val fwd = ids.as("a").join(ids.as("b"),
          expr("b.id = a.id * 2 AND a.id > 0"))
        .select(col("a.id").as("src"), col("b.id").as("dst"))
      ccMinLabel(fwd, ids)
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    },

    // BM25 relevance scoring of every document against a fixed query
    // ("data model the") — the retrieval-quality / data-selection scoring
    // pass. All counts (tf, df, dl, N) are exact integers computed
    // SCAN-SIDE (one filter per term — no explode, no per-term shuffle);
    // the only aggregation is one global 1-row stats frame, broadcast back.
    // Both engines evaluate the identical FP expression tree and round the
    // one transcendental (ln) output to 6 dp — the established parity rule.
    QDef(
      "q_ext_bm25",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text,' '), w -> w <> '')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'data')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'model')) AS BIGINT) AS tf2,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'the')) AS BIGINT) AS tf3
        |  FROM documents),
        |g AS (SELECT count(*) AS n, CAST(SUM(dl) AS BIGINT) AS sdl,
        |    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
        |    CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df3
        |  FROM t)
        |SELECT doc_id,
        |  round(ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n))))
        |      + ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n))))
        |      + ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) * ((tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))), 6) AS bm25
        |FROM t, g ORDER BY doc_id""".stripMargin) { (s, d) =>
      def tf(term: String) =
        size(expr(s"filter(split(text,' '), w -> w = '$term')")).cast("long")
      val t = Tables.documents(s, d).select(col("doc_id"),
        TextOps.nWords.as("dl"),
        tf("data").as("tf1"), tf("model").as("tf2"), tf("the").as("tf3"))
      val g = t.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"),
        sum(when(col("tf1") > 0, 1).otherwise(0)).cast("long").as("df1"),
        sum(when(col("tf2") > 0, 1).otherwise(0)).cast("long").as("df2"),
        sum(when(col("tf3") > 0, 1).otherwise(0)).cast("long").as("df3"))
      // identical expression tree to the oracle: left-assoc, same parens
      def score(tfc: String, dfc: String) =
        log(lit(1) + (col("n") - col(dfc) + lit(0.5)) / (col(dfc) + lit(0.5))) *
          ((col(tfc) * lit(2.2)) / (col(tfc) + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") /
              (col("sdl").cast("double") / col("n")))))
      t.crossJoin(broadcast(g))
        .select(col("doc_id"),
          round(score("tf1", "df1") + score("tf2", "df2") + score("tf3", "df3"), 6)
            .as("bm25"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: flag training documents that share any word
    // 3-gram with the held-out benchmark slice (doc_id % 97 = 0) — the
    // train/test contamination sweep every pretraining corpus needs.
    // (Production sweeps use 8-13-gram windows; gram size is a parameter —
    // the synthetic corpus only collides at 3.) The benchmark gram set is
    // small by construction, so it BROADCASTS; the corpus side is one
    // explode + broadcast-hash-join + count, no corpus-sized shuffle.
    QDef(
      "q_ext_contamination",
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
        |      FROM w WHERE len(ws) >= 3),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0),
        |hits AS (SELECT tr.doc_id, count(*) AS n_shared
        |         FROM tr JOIN b USING (gram) GROUP BY tr.doc_id)
        |SELECT d.doc_id, CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  coalesce(h.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(TextOps.shingles(3)).as("gram"))
      val bench = grams.filter(col("doc_id") % 97 === 0)
        .select("gram").distinct()
      // NO forced broadcast: this benchmark slice is corpus-proportional, so
      // the gram join must stay a shuffle join at scale (linear, never
      // collected to one node); AQE converts it to broadcast at runtime
      // whenever the benchmark set is genuinely small
      val hits = grams.filter(col("doc_id") % 97 =!= 0)
        .join(bench, Seq("gram"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      Tables.documents(s, d).filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    },

    // Policy-ranked canonical selection: within each exact-duplicate group
    // (grouped by content hash) keep the BEST copy — longest text, then
    // smallest id — and report the group size. This is exact dedup upgraded
    // from "keep first" to "keep by quality policy", the form pipelines
    // actually run. Planted copies (reproduced verbatim in the oracle SQL,
    // so both engines see the same corpus) make the groups non-trivial.
    // Shuffle key is md5(text) — 16 bytes, never the document body.
    QDef(
      "q_ext_dedup_keep_best",
      """WITH corpus AS (
        |  SELECT doc_id, lang, n_chars, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, n_chars, text FROM documents WHERE doc_id < 50)
        |SELECT doc_id, lang, dup_count FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY md5(text)) AS dup_count
        |  FROM corpus) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "n_chars", "text")
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("n_chars"), col("text")))
      val grp = Window.partitionBy(md5(col("text")))
      val w = grp.orderBy(col("n_chars").desc, col("doc_id").asc)
      corpus
        .withColumn("rn", row_number().over(w))
        .withColumn("dup_count", count(lit(1)).over(grp))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "dup_count")
        .orderBy("doc_id")
    },

    // Corpus TF-IDF: top-3 most characteristic terms per document. tf/df/N
    // are exact integers; the score is the one identical FP tree
    // (tf · ln(N/df)) rounded 6 dp on output only — the bm25 parity rule.
    // Shuffle keys are (doc_id, word) pairs and words — never document
    // bodies; the df relation is vocabulary-sized (≪ corpus) so AQE
    // broadcasts it when genuinely small, and the per-doc top-3 is a
    // partitioned row_number, bounded state per task.
    QDef(
      "q_ext_tfidf",
      """WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT doc_id, tf.word AS word,
        |         CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |       FROM tf, df, n WHERE tf.word = df.word)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, word, round(score, 6) AS tfidf FROM (
        |  SELECT doc_id, word, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn FROM sc) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val words = docs.select(col("doc_id"), explode(TextOps.words).as("word"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfr, Seq("word")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          (col("tf").cast("double") *
            log(col("n").cast("double") / col("df").cast("double"))).as("score"))
      val w3 = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word"))
      scored.withColumn("rn", row_number().over(w3).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("word"),
          round(col("score"), 6).as("tfidf"))
        .orderBy("doc_id", "rn")
    },

    // Zipf head: top-50 corpus token frequencies with rank, share and
    // cumulative share. The corpus-sized work is ONE word-keyed groupBy with
    // map-side partials; the global ordered window runs AFTER the
    // distributed top-k limit (TakeOrdered), i.e. over ≤50 rows — never the
    // vocabulary, never the corpus. Shares are exact-long divisions
    // (Σfreq ≤ 2^53), rounded 6 dp on output only.
    QDef(
      "q_ext_zipf",
      """WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents),
        |f AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM w),
        |top AS (SELECT word, freq FROM f ORDER BY freq DESC, word LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank,
        |  word, CAST(freq AS BIGINT) AS freq,
        |  round(CAST(freq AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
        |  round(CAST(SUM(freq) OVER (ORDER BY freq DESC, word ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
        |FROM top, t ORDER BY rank""".stripMargin) { (s, d) =>
      val words = Tables.documents(s, d)
        .select(explode(TextOps.words).as("word"))
      val freq = words.groupBy("word").agg(count(lit(1)).as("freq"))
      // total tokens = Σfreq over the vocabulary-sized frame — no second
      // corpus explode
      val tot = freq.agg(sum("freq").as("total"))
      val top = freq.orderBy(col("freq").desc, col("word")).limit(50)
      val ord = Window.orderBy(col("freq").desc, col("word"))
      top.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(ord).cast("long"))
        .withColumn("cum", sum("freq")
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rank"), col("word"), col("freq"),
          round(col("freq").cast("double") / col("total").cast("double"), 6).as("share"),
          round(col("cum").cast("double") / col("total").cast("double"), 6).as("cum_share"))
        .orderBy("rank")
    },

    // Portable MinHash with a FULL cross-engine oracle: 8 md5-derived
    // min-hashes per doc (md5 is the one hash both engines share — the
    // xxhash64 variant stays test-only), banded 2×4 for candidate
    // generation, then the signature-agreement Jaccard ESTIMATE side by
    // side with the TRUE shingle-set Jaccard for every candidate pair.
    // Planted near-dups (suffix-perturbed copies, reproduced verbatim in
    // the oracle) give the bands real positives. One explode feeds 8 min
    // aggregates (no seed×shingle blowup); candidates come from per-band
    // self-joins on the concatenated signature (shuffle-native, the
    // q_ext_minhash_neardup discipline); the true-Jaccard intersection
    // join is candidate-bounded.
    QDef(
      "q_ext_minhash_jaccard",
      s"""WITH $minhashCtes,
        |est AS (SELECT c.id_a, c.id_b, count(CASE WHEN sa.mh = sb.mh THEN 1 END) AS n_match
        |        FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
        |        JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
        |        GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS ns FROM g GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(*) AS ni
        |          FROM cand c JOIN g ga ON ga.doc_id = c.id_a
        |          JOIN g gb ON gb.doc_id = c.id_b AND gb.sh = ga.sh
        |          GROUP BY 1, 2)
        |SELECT e.id_a, e.id_b, CAST(e.n_match AS BIGINT) AS n_match,
        |  round(CAST(e.n_match AS DOUBLE) / 8.0, 6) AS est_jaccard,
        |  round(CAST(i.ni AS DOUBLE) / CAST(sa.ns + sb.ns - i.ni AS DOUBLE), 6) AS true_jaccard
        |FROM est e
        |JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
        |JOIN sizes sa ON sa.doc_id = e.id_a
        |JOIN sizes sb ON sb.doc_id = e.id_b
        |ORDER BY e.id_a, e.id_b""".stripMargin) { (s, d) =>
      val (g, _, cand) = minhashPipeline(s, d)
      val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val inter = cand.select("id_a", "id_b")
        .join(g.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a"))
        .join(g.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      cand.join(inter, Seq("id_a", "id_b"))
        .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("n_match"),
          round(col("n_match").cast("double") / 8.0, 6).as("est_jaccard"),
          round(col("ni").cast("double") /
            (col("na") + col("nb") - col("ni")).cast("double"), 6).as("true_jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Dedup-pipeline EVALUATION: precision/recall of the banded-MinHash
    // candidate generator against exact-Jaccard ground truth at τ = 0.5,
    // the measurement that decides band/row counts before a 100 TB dedup
    // run. Ground truth is all-pairs true Jaccard over a BOUNDED evaluation
    // slice (doc_id < 50 + its planted variants) — the honest pattern
    // q_ext_ann_recall established: exact ground truth at evaluation scale,
    // the measured system at corpus scale. The τ-threshold compares pure
    // integers (3·|∩| ≥ |A|+|B| ⟺ J ≥ 0.5), so membership is bit-exact.
    QDef(
      "q_ext_dedup_eval",
      s"""WITH $minhashCtes,
        |gs AS (SELECT * FROM g WHERE doc_id < 50 OR doc_id >= 1000000),
        |sizes AS (SELECT doc_id, count(*) AS ns FROM gs GROUP BY 1),
        |inter AS (SELECT ga.doc_id AS id_a, gb.doc_id AS id_b, count(*) AS ni
        |          FROM gs ga JOIN gs gb ON gb.sh = ga.sh AND ga.doc_id < gb.doc_id
        |          GROUP BY 1, 2),
        |truth AS (SELECT i.id_a, i.id_b FROM inter i
        |          JOIN sizes sa ON sa.doc_id = i.id_a
        |          JOIN sizes sb ON sb.doc_id = i.id_b
        |          WHERE 3 * i.ni >= sa.ns + sb.ns),
        |cs AS (SELECT id_a, id_b FROM cand
        |       WHERE (id_a < 50 OR id_a >= 1000000) AND (id_b < 50 OR id_b >= 1000000)),
        |tp AS (SELECT count(*) AS n_tp FROM truth JOIN cs USING (id_a, id_b)),
        |nt AS (SELECT count(*) AS n_truth FROM truth),
        |nc AS (SELECT count(*) AS n_cand FROM cs)
        |SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
        |  CAST(n_tp AS BIGINT) AS n_tp,
        |  round(CAST(n_tp AS DOUBLE) / n_cand, 6) AS prec,
        |  round(CAST(n_tp AS DOUBLE) / n_truth, 6) AS recall
        |FROM nt, nc, tp""".stripMargin) { (s, d) =>
      val (g, _, cand) = minhashPipeline(s, d)
      def inSlice(c: org.apache.spark.sql.Column) = c < 50 || c >= 1000000L
      val gs = g.filter(inSlice(col("doc_id")))
      val sizes = gs.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val inter = gs.select(col("doc_id").as("id_a"), col("sh"))
        .join(gs.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
      val truth = inter
        .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("nb")), Seq("id_b"))
        .filter(lit(3) * col("ni") >= col("na") + col("nb"))
        .select("id_a", "id_b")
      val cs = cand.filter(inSlice(col("id_a")) && inSlice(col("id_b")))
        .select("id_a", "id_b")
      val tp = truth.join(cs, Seq("id_a", "id_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(cs.agg(count(lit(1)).as("n_cand")))
        .crossJoin(tp.agg(count(lit(1)).as("n_tp")))
        .select(col("n_truth"), col("n_cand"), col("n_tp"),
          round(col("n_tp").cast("double") / col("n_cand"), 6).as("prec"),
          round(col("n_tp").cast("double") / col("n_truth"), 6).as("recall"))
    },

    // End-to-end near-dup RESOLUTION: minhash-banded candidate pairs →
    // distributed connected components → dedup clusters — the full
    // candidates-to-clusters pipeline a production dedup run executes,
    // composed from the SAME shared stages (minhashPipeline + ccMinLabel)
    // the piecewise queries pin, and oracled END TO END: DuckDB rebuilds
    // the identical candidates and closes them with a recursive CTE. The
    // planted probes (doc_id + 1,000,000 re-crawls) must land in their
    // originals' clusters, which CurationSpec asserts on top of the hash
    // match.
    //
    // 100 TB posture: candidates come banded (never all-pairs), the CC
    // loop is one edge⋈label shuffle + min-groupBy per round with pointer
    // jumping (O(log diameter) rounds), and the cluster roll-up is one
    // final groupBy on the label — at no stage does a document body or an
    // unbounded pair space shuffle.
    QDef(
      "q_ext_dedup_e2e",
      s"""WITH RECURSIVE $minhashCtes,
        |e AS (SELECT id_a AS src, id_b AS dst FROM cand
        |      UNION ALL SELECT id_b AS src, id_a AS dst FROM cand),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |cc AS (SELECT id, id AS comp FROM n
        |       UNION
        |       SELECT e.dst AS id, cc.comp AS comp FROM cc JOIN e ON cc.id = e.src),
        |lab AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id)
        |SELECT comp AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(max(id) AS BIGINT) AS max_doc
        |FROM lab GROUP BY comp ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val (_, _, cand) = minhashPipeline(s, d)
      val fwd = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
      // node relation derived INSIDE ccMinLabel from the checkpointed
      // symmetric closure — passing endpoints built from `fwd` here would
      // re-evaluate the whole banded-candidate pipeline a second time
      ccMinLabel(fwd)
        .groupBy(col("comp").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_doc"))
        .orderBy("cluster_id")
    },

    // Unigram log-probability scoring — the perplexity-proxy quality signal
    // (docs full of corpus-rare tokens score low). The order-dependence
    // trap: Σ ln(p_w) over a doc is a DOUBLE sum, whose partial order Spark
    // does not fix — so each word's log-prob is quantized ONCE to integer
    // micros with floor() (identical on both engines for every double,
    // unlike half-even vs half-away rounding) and the per-doc sum runs in
    // exact longs. The corpus is exploded ONCE: everything downstream works
    // on the per-(doc, word) count frame — word frequency is Σlf over it,
    // and the per-doc sum weights each word's log-prob by lf instead of
    // re-joining raw tokens.
    QDef(
      "q_ext_unigram_logprob",
      """WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word FROM documents),
        |dw AS (SELECT doc_id, word, count(*) AS lf FROM w GROUP BY 1, 2),
        |f AS (SELECT word, CAST(SUM(lf) AS BIGINT) AS freq FROM dw GROUP BY 1),
        |t AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
        |lp AS (SELECT word, CAST(floor(ln(CAST(freq AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000) AS BIGINT) AS lp_micro FROM f, t),
        |s AS (SELECT doc_id, CAST(SUM(lf) AS BIGINT) AS n_tokens,
        |        CAST(SUM(lf * lp_micro) AS BIGINT) AS lp_sum
        |      FROM dw JOIN lp USING (word) GROUP BY 1)
        |SELECT doc_id, n_tokens, lp_sum,
        |  CAST(lp_sum AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE) AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dw = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("lf"))
      val f = dw.groupBy("word").agg(sum("lf").as("freq"))
      val t = f.agg(sum("freq").as("total"))
      val lp = f.crossJoin(broadcast(t)).select(col("word"),
        floor(log(col("freq").cast("double") / col("total").cast("double"))
          * lit(1000000)).as("lp_micro"))
      dw.join(lp, Seq("word"))
        .groupBy("doc_id")
        .agg(sum("lf").as("n_tokens"), sum(col("lf") * col("lp_micro")).as("lp_sum"))
        .select(col("doc_id"), col("n_tokens"), col("lp_sum"),
          (col("lp_sum").cast("double") / lit(1000000.0) /
            col("n_tokens").cast("double")).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // Per-language KL divergence from the corpus word distribution — the
    // domain/language drift measure mixture tuning needs. Same
    // floor-quantization discipline: each vocab term's p·ln(p/q)
    // contribution becomes exact integer nanos, so the per-language sum is
    // order-independent. All frames after the explode are vocab-sized.
    QDef(
      "q_ext_kl_language",
      """WITH w AS (SELECT lang, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word FROM documents),
        |lw AS (SELECT lang, word, count(*) AS lf FROM w GROUP BY 1, 2),
        |lt AS (SELECT lang, CAST(SUM(lf) AS BIGINT) AS ltot FROM lw GROUP BY 1),
        |cw AS (SELECT word, CAST(SUM(lf) AS BIGINT) AS cf FROM lw GROUP BY 1),
        |ct AS (SELECT CAST(SUM(cf) AS BIGINT) AS ctot FROM cw),
        |terms AS (SELECT lw.lang,
        |    CAST(floor((CAST(lf AS DOUBLE) / CAST(ltot AS DOUBLE)) *
        |      ln((CAST(lf AS DOUBLE) / CAST(ltot AS DOUBLE)) / (CAST(cf AS DOUBLE) / CAST(ctot AS DOUBLE))) * 1000000000) AS BIGINT) AS kl_nano
        |  FROM lw JOIN lt ON lw.lang = lt.lang JOIN cw ON lw.word = cw.word, ct)
        |SELECT lang, CAST(SUM(kl_nano) AS BIGINT) AS kl_nano_sum,
        |  CAST(SUM(kl_nano) AS DOUBLE) / 1000000000.0 AS kl
        |FROM terms GROUP BY 1 ORDER BY lang""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d).select(col("lang"),
        explode(TextOps.words).as("word"))
      val lw = w.groupBy("lang", "word").agg(count(lit(1)).as("lf"))
      val lt = lw.groupBy("lang").agg(sum("lf").as("ltot"))
      val cw = lw.groupBy("word").agg(sum("lf").as("cf"))
      val ct = cw.agg(sum("cf").as("ctot"))
      val p = col("lf").cast("double") / col("ltot").cast("double")
      val q = col("cf").cast("double") / col("ctot").cast("double")
      lw.join(lt, Seq("lang")).join(cw, Seq("word")).crossJoin(broadcast(ct))
        .select(col("lang"),
          floor(p * log(p / q) * lit(1000000000)).as("kl_nano"))
        .groupBy("lang").agg(sum("kl_nano").as("kl_nano_sum"))
        .select(col("lang"), col("kl_nano_sum"),
          (col("kl_nano_sum").cast("double") / lit(1000000000.0)).as("kl"))
        .orderBy("lang")
    },

    // Source mixture weights: tokens^0.7 proportional sampling shares (the
    // standard sub-linear source-balancing exponent). The power is written
    // exp(0.7·ln(x)) on BOTH engines — ln/exp are the established
    // bit-identical transcendentals, whereas libm pow() is not guaranteed
    // correctly-rounded and may differ between the JVM and DuckDB. Shares
    // divide exact longs (floor-quantized micros).
    QDef(
      "q_ext_mixture_weights",
      """WITH d AS (SELECT source,
        |    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS toks
        |  FROM documents),
        |s AS (SELECT source, count(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |wts AS (SELECT source, n_docs, n_tokens,
        |    CASE WHEN n_tokens > 0
        |         THEN CAST(floor(exp(0.7 * ln(CAST(n_tokens AS DOUBLE))) * 1000000) AS BIGINT)
        |         ELSE 0 END AS w_micro FROM s),
        |tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS sw FROM wts)
        |SELECT source, n_docs, n_tokens, w_micro,
        |  CAST(w_micro AS DOUBLE) / CAST(sw AS DOUBLE) AS share
        |FROM wts, tot ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("source"), TextOps.nWords.as("toks"))
      val st = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      // an all-empty source would hit ln(0): Spark yields NULL but DuckDB
      // RAISES — the CASE guard (lazy on both engines) pins weight 0 instead
      val wts = st.select(col("source"), col("n_docs"), col("n_tokens"),
        when(col("n_tokens") > 0,
          floor(exp(lit(0.7) * log(col("n_tokens").cast("double")))
            * lit(1000000))).otherwise(0L).as("w_micro"))
      val tot = wts.agg(sum("w_micro").as("sw"))
      wts.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("w_micro"),
          (col("w_micro").cast("double") / col("sw").cast("double")).as("share"))
        .orderBy("source")
    },

    // Document chunking: fixed 50-token windows at stride 40 (10-token
    // overlap) — the RAG-indexing / context-packing preparation step. Pure
    // map + explode over per-doc offset sequences; rows out ≈ tokens/40, no
    // shuffle except the presentation sort. Chunk boundaries, sizes and
    // edge words are all integer/string — fully oracle-able. A start is
    // emitted only while it contributes NEW tokens (start ≤ max(n−10, 1) —
    // beyond that the window is a strict subset of its predecessor, which
    // would duplicate content in the index).
    QDef(
      "q_ext_doc_chunks",
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 10, 1) + 1, 40)) AS start FROM w WHERE len(ws) > 0)
        |SELECT doc_id, CAST((start - 1) // 40 + 1 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(least(50, len(ws) - start + 1) AS BIGINT) AS n_chunk_tokens,
        |  ws[start] AS first_word,
        |  ws[start + least(50, len(ws) - start + 1) - 1] AS last_word
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.words.as("ws"))
        .filter(size(col("ws")) > 0)
        .select(col("doc_id"), col("ws"),
          explode(expr("sequence(1, greatest(size(ws) - 10, 1), 40)")).as("start"))
        .select(col("doc_id"),
          expr("(start - 1) div 40 + 1").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          expr("cast(least(50, size(ws) - start + 1) as bigint)").as("n_chunk_tokens"),
          expr("element_at(ws, start)").as("first_word"),
          expr("element_at(ws, cast(start + least(50, size(ws) - start + 1) - 1 as int))")
            .as("last_word"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Per-language token-length DECILES at exact order statistics (the
    // distribution profile a curation run reads before setting length
    // cuts). Rank-based selection (value at rank ⌈q·n⌉) keeps every decile
    // an actual data value — bit-exact across engines, unlike value-space
    // percentile interpolation over doubles. ONE corpus scan: rn and the
    // per-language n come from the same lang-partitioned window pass (the
    // unordered count's requirement is satisfied by the rank sort, so no
    // second Exchange), then a 9-row broadcast decile grid selects rows.
    // rn is unique within lang, so each (lang, decile) matches exactly one
    // row — no re-aggregation needed.
    QDef(
      "q_ext_length_deciles",
      """WITH d AS (SELECT lang, doc_id, CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS toks FROM documents WHERE lang IS NOT NULL),
        |rk AS (SELECT lang, toks,
        |         row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |       FROM d),
        |qs AS (SELECT unnest(range(1, 10)) AS decile)
        |SELECT lang, CAST(decile AS BIGINT) AS decile, toks AS toks_at_decile
        |FROM rk JOIN qs ON rk.rn = (decile * n + 9) // 10
        |ORDER BY lang, decile""".stripMargin) { (s, d) =>
      // lang IS NOT NULL on both sides: no null langs exist in the data,
      // but a NULL partition would otherwise order differently (Spark
      // NULLS FIRST vs DuckDB NULLS LAST on ASC)
      val docs = Tables.documents(s, d).filter(col("lang").isNotNull)
        .select(col("lang"), col("doc_id"), TextOps.nWords.as("toks"))
      val rk = docs
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("toks"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      val qs = s.range(1, 10).select(col("id").as("decile"))
      // ⌈d·n/10⌉ in PURE INTEGER arithmetic: DuckDB types a bare 0.1 as
      // DECIMAL (exact) while Spark uses DOUBLE, so ceil(d*0.1*n) disagrees
      // whenever d·n is a multiple of 10 — integer (d·n+9) div 10 is
      // identical on both engines for every n
      rk.join(broadcast(qs),
          col("rn") === expr("(decile * n + 9) div 10"))
        .select(col("lang"), col("decile"), col("toks").as("toks_at_decile"))
        .orderBy("lang", "decile")
    },

    // Importance sampling (DSIR-style shape): accept each document with
    // probability proportional to a per-doc weight (here length-capped
    // min(n_chars,400)/400), decided by comparing a 16-bit slice of
    // md5(doc_id) against the weight as a 4-hex-digit threshold — map-only,
    // no rand(), identical acceptance under retries/engines (the
    // q_ext_stratified_sample determinism rule, upgraded from a constant
    // rate to per-row weights). The 65535 clamp keeps the threshold 4
    // digits; weight-1.0 rows accept at 65535/65536.
    QDef(
      "q_ext_importance_sample",
      """SELECT doc_id, n_chars,
        |  CAST(least(least(n_chars, 400) * 65536 // 400, 65535) AS BIGINT) AS w16
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      < printf('%04x', CAST(least(least(n_chars, 400) * 65536 // 400, 65535) AS INT))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w16 = expr("least(least(n_chars, 400) * 65536 div 400, 65535)")
      Tables.documents(s, d)
        .withColumn("w16", w16.cast("long"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) <
          format_string("%04x", w16.cast("int")))
        .select("doc_id", "n_chars", "w16")
        .orderBy("doc_id")
    },

    // Shingle novelty — incremental 8-gram containment against every
    // earlier document (the "how much of this doc is new text" measure
    // fuzzy-dedup pipelines rank by). Each shingle OCCURRENCE is charged to
    // its first-owning doc (min doc_id corpus-wide), so a doc that repeats
    // its own novel 8-gram still counts it as novel, while any 8-gram seen
    // in an earlier doc does not. Scale: the only corpus-sized shuffle
    // carries md5(shingle) 32-hex keys, never shingle text (the
    // q_ext_exact_dedup discipline); the first-owner map is one row per
    // distinct shingle, partial-min'd map-side.
    QDef(
      "q_ext_shingle_novelty",
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, md5(array_to_string(ws[i:i+7], ' ')) AS gh
        |       FROM w, unnest(range(1, len(ws) - 6)) AS t(i)),
        |own AS (SELECT gh, min(doc_id) AS owner FROM sh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_shingles,
        |       CAST(SUM(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS novel_frac
        |FROM sh JOIN own USING (gh) GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.words.as("ws"))
        // sequence() DESCENDS when stop < start — short docs must yield
        // an empty shingle list, not a negative-index walk
        .select(col("doc_id"), explode(when(size(col("ws")) >= 8,
          expr("transform(sequence(1, size(ws) - 7), " +
            "i -> md5(concat_ws(' ', slice(ws, i, 8))))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("gh"))
      // one explicit gh-repartition that BOTH the first-owner aggregation
      // and the probe consume (stage reuse): the 8-gram md5 explode runs
      // once, not once per side; only 32-hex digests shuffle
      val shP = sh.repartition(col("gh"))
      val own = shP.groupBy("gh").agg(min("doc_id").as("owner"))
      shP.join(own, Seq("gh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("owner") === col("doc_id"), 1).otherwise(0)).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_shingles").cast("double"))
            .as("novel_frac"))
        .orderBy("doc_id")
    },

    // Bigram LM scoring — conditional log-prob avg Σ ln c(w1w2)/c(w1·)
    // per document, the next step up from q_ext_unigram_logprob's
    // perplexity proxy (and the same parity discipline: each bigram's
    // log-prob floor-quantizes ONCE to integer micros, per-doc sums run in
    // exact longs). The corpus explodes once into per-(doc, bigram) counts;
    // the bigram and unigram-context tables both aggregate THAT frame, so
    // everything downstream of the explode is vocab²-sized, not corpus-sized.
    QDef(
      "q_ext_bigram_logprob",
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |dbg AS (SELECT doc_id, w1, b, count(*) AS lf FROM bg GROUP BY 1, 2, 3),
        |cb AS (SELECT w1, b, CAST(SUM(lf) AS BIGINT) AS cnt FROM dbg GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS u FROM cb GROUP BY 1),
        |lp AS (SELECT b, CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(u AS DOUBLE)) * 1000000) AS BIGINT) AS lp_micro
        |       FROM cb JOIN cu USING (w1)),
        |s AS (SELECT doc_id, CAST(SUM(lf) AS BIGINT) AS n_bigrams, CAST(SUM(lf * lp_micro) AS BIGINT) AS lp_sum
        |      FROM dbg JOIN lp USING (b) GROUP BY 1)
        |SELECT doc_id, n_bigrams, lp_sum,
        |       CAST(lp_sum AS DOUBLE) / 1000000.0 / CAST(n_bigrams AS DOUBLE) AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dbg = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.words.as("ws"))
        .select(col("doc_id"), explode(when(size(col("ws")) >= 2,
          expr("transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS w1, " +
            "concat(element_at(ws, i), ' ', element_at(ws, i + 1)) AS b))"))
          .otherwise(expr(
            "CAST(array() AS ARRAY<STRUCT<w1: STRING, b: STRING>>)"))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.b").as("b"))
        .groupBy("doc_id", "w1", "b").agg(count(lit(1)).as("lf"))
      val cb = dbg.groupBy("w1", "b").agg(sum("lf").as("cnt"))
      val cu = cb.groupBy("w1").agg(sum("cnt").as("u"))
      val lp = cb.join(cu, Seq("w1"))
        .select(col("b"), floor(log(col("cnt").cast("double") /
          col("u").cast("double")) * lit(1000000)).as("lp_micro"))
      dbg.join(lp, Seq("b"))
        .groupBy("doc_id")
        .agg(sum("lf").as("n_bigrams"),
          sum(col("lf") * col("lp_micro")).as("lp_sum"))
        .select(col("doc_id"), col("n_bigrams"), col("lp_sum"),
          (col("lp_sum").cast("double") / lit(1000000.0) /
            col("n_bigrams").cast("double")).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // Incremental ingestion dedup — the ongoing-crawl shape: an INCOMING
    // batch (odd-id docs plus a planted re-crawl of every doc_id < 100)
    // dedups in two stages against a standing corpus SNAPSHOT (even-id
    // docs): first within the batch (min-doc_id wins per content hash),
    // then against the snapshot's hash set. Statuses: 'new',
    // 'dup_in_batch', 'dup_vs_snapshot'. Scale: both sides shuffle
    // md5(text) 32-hex keys only (the q_ext_exact_dedup discipline); the
    // snapshot side is a distinct-hash relation, joined — never collected.
    QDef(
      "q_ext_incremental_dedup",
      """WITH existing AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
        |inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |        UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100),
        |r AS (SELECT doc_id, md5(text) AS h,
        |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |      FROM inc)
        |SELECT r.doc_id,
        |  CASE WHEN e.h IS NOT NULL THEN 'dup_vs_snapshot'
        |       WHEN rn > 1 THEN 'dup_in_batch' ELSE 'new' END AS status
        |FROM r LEFT JOIN existing e ON r.h = e.h
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val existing = docs.filter(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("h")).distinct()
      val inc = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
        .unionByName(docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      inc.select(col("doc_id"), md5(col("text")).as("h"),
          row_number().over(w).as("rn"))
        .join(existing.withColumnRenamed("h", "eh"),
          col("h") === col("eh"), "left")
        .select(col("doc_id"),
          when(col("eh").isNotNull, "dup_vs_snapshot")
            .when(col("rn") > 1, "dup_in_batch")
            .otherwise("new").as("status"))
        .orderBy("doc_id")
    },

    // Word-entropy quality signal — per-doc Shannon entropy of the word
    // distribution (lexical diversity: gibberish and boilerplate both sit
    // at the tails), the fourth scoring member beside unigram/bigram
    // log-prob and quality_score. Exact-parity trick: H = ln n − (Σ c·ln c)/n
    // with each ln floor-quantized ONCE to integer micros; the weighted sum
    // runs in longs and the final subtraction/division is integer — no
    // double accumulation anywhere (the q_ext_unigram_logprob discipline).
    // One explode → per-(doc,word) counts → one doc-keyed aggregation.
    QDef(
      "q_ext_word_entropy",
      """WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word FROM documents),
        |c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
        |s AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS sl
        |      FROM c GROUP BY 1)
        |SELECT doc_id, n,
        |  CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) - sl // n AS h_micro,
        |  CAST(CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) - sl // n AS DOUBLE) / 1000000.0 AS entropy
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      val c = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      val lnMicro = floor(log(col("c").cast("double")) * lit(1000000)).cast("long")
      c.groupBy("doc_id")
        .agg(sum("c").as("n"), sum(col("c") * lnMicro).as("sl"))
        .select(col("doc_id"), col("n"),
          (floor(log(col("n").cast("double")) * lit(1000000)).cast("long") -
            expr("sl div n")).as("h_micro"))
        .select(col("doc_id"), col("n"), col("h_micro"),
          (col("h_micro").cast("double") / lit(1000000.0)).as("entropy"))
        .orderBy("doc_id")
    },

    // PageRank over the part↔supplier bipartite graph (distinct lineitem
    // pairs as undirected edges, both directions materialized) — the link
    // analysis that ranks "hub" entities, and the second iterative-graph
    // member beside q_ext_dedup_clusters' connected components. Five fixed
    // iterations in pure INTEGER micro-rank arithmetic: contrib = pr div
    // outdeg, pr' = (0.15 + 0.85·Σcontrib) in micros — every step is
    // integer div/mult/sum, so the result is bit-identical and
    // order-independent on both engines (no double accumulation anywhere).
    // Every node has outdeg ≥ 1 (nodes exist only as edge endpoints and the
    // edge set is symmetric), so there is no dangling mass and every node
    // re-receives rank each round.
    //
    // 100 TB posture: per iteration ONE shuffle join (edges ⋈ ranks on the
    // integer node id — outdeg is pre-folded onto the edge relation, so no
    // second join) + one map-side-combined sum; IterCkpt truncates the
    // growing lineage each round exactly as the CC loop does AND frees the
    // superseded round's blocks (only the final frame stays pinned). Fixed
    // iteration count (not a convergence collect) keeps the driver out of
    // the loop entirely. Overflow bound: rank mass is conserved at N·1e6
    // micros, so a single hub's 85·Σcontrib stays under 2^63 up to ~1e11
    // nodes; past that, shard the contribution sum hi/lo (the
    // q_agg_corr_exact discipline) before the 85× scale-up.
    QDef(
      "q_ext_pagerank",
      pagerankSql) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val e0 = li.select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // reciprocalFree: every forward edge is (even → odd) and every
      // reversed edge (odd → even) — the two halves of the symmetric
      // closure cannot collide, so its dedup pass is skipped
      pageRankMicro(e0, iters = 5, reciprocalFree = true)
        .select(col("id").as("node_id"),
          expr("CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END").as("node_type"),
          expr("id div 2").as("key"),
          col("pr").as("pr_micro"))
        .orderBy(desc("pr_micro"), col("node_id"))
        .limit(100)
    },

    // Levenshtein near-dup VERIFY over MinHash candidates — character-level
    // fuzzy matching, the edit-distance member of the dedup family (beside
    // shingle/minhash/simhash token-level and embedding semantic-level).
    // Candidates come from the SHARED banded-LSH pipeline (minhashPipeline —
    // the same candidate set the estimator and its evaluator see), so the
    // pair space is proportional to the corpus's true duplicate structure,
    // never to block sizes: the earlier (lang, n_chars div 10) blocking
    // self-join grew quadratically with docs-per-block (SCALE.md measured
    // 29.4× at 10×) because block cardinality scales WITH the corpus — LSH
    // band buckets don't. The old blocking keys survive as residual FILTERS
    // on the candidate pairs: same lang, and |len| within the distance bound
    // (|len_a − len_b| > k proves dist > k, so the residual is sound, not
    // heuristic). The distance runs on a 120-char prefix (constant per-pair
    // cost, never O(len²) on outliers).
    //
    // Two CPU-shape decisions a size-based planner cannot make: (1) the
    // candidate pairs re-spread over defaultParallelism by pair id — the
    // pair stream is tiny in BYTES but expensive in CPU, so AQE's size-based
    // coalescing would otherwise serialize the distance loop onto a few
    // reducers; (2) the distance is the BOUNDED O(len·k)
    // levenshtein(l, r, 20) (Ukkonen band), which returns -1 past the
    // threshold — the kept set and kept values are identical to the
    // oracle's unbounded filter.
    QDef(
      "q_ext_edit_distance",
      s"""WITH $minhashCtes,
        |meta AS (
        |  SELECT doc_id, lang, substring(text, 1, 120) AS pfx FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang,
        |         substring(text || ' graft dup probe', 1, 120)
        |  FROM documents WHERE doc_id < 30),
        |m2 AS (SELECT doc_id, lang, pfx, length(pfx) AS pl FROM meta)
        |SELECT cand.id_a, cand.id_b, levenshtein(a.pfx, b.pfx) AS dist
        |FROM cand
        |JOIN m2 a ON cand.id_a = a.doc_id
        |JOIN m2 b ON cand.id_b = b.doc_id
        |WHERE a.lang = b.lang AND abs(a.pl - b.pl) <= 20
        |  AND levenshtein(a.pfx, b.pfx) <= 20
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val (_, _, cand) = minhashPipeline(s, d)
      val docs = Tables.documents(s, d)
      val meta = docs.select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 120).as("pfx"))
        .unionByName(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            substring(concat(col("text"), lit(" graft dup probe")), 1, 120).as("pfx")))
        .withColumn("pl", length(col("pfx")))
      cand.select("id_a", "id_b")
        .join(meta.as("a"), col("id_a") === col("a.doc_id"))
        .join(meta.as("b"), col("id_b") === col("b.doc_id"))
        .filter(col("a.lang") === col("b.lang") &&
          abs(col("a.pl") - col("b.pl")) <= 20)
        .select(col("id_a"), col("id_b"),
          col("a.pfx").as("pa"), col("b.pfx").as("pb"))
        .repartition(s.sparkContext.defaultParallelism, col("id_a"), col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pa"), col("pb"), 20).as("dist"))
        .filter(col("dist") =!= -1)
        .orderBy("id_a", "id_b")
    },

    // Corpus boilerplate detection (the CCNet/C4 cleaning step): a shingle
    // that occurs in ≥ 3 DISTINCT documents is boilerplate (headers,
    // navigation, license blurbs — text repeated across the corpus rather
    // than within one doc, which is q_ext_repetition_filter's axis, and
    // unlike q_ext_shingle_novelty's first-owner containment this measures
    // corpus-wide document frequency). Per doc: distinct-shingle count,
    // boilerplate-shingle count, fraction, and the keep flag at the C4-ish
    // 0.5 cutoff. Shingles are the SHARED TextOps 3-gram contract (the
    // minhash shingling), distinct within doc, so df = document frequency
    // by construction. The fraction divides two exact longs — both engines
    // evaluate the identical division, so even the 0.5 boundary is safe.
    //
    // 100 TB posture: shuffle keys are md5(shingle) digests (16 B), never
    // text; the df table aggregates map-side-combined distinct-per-doc
    // rows; both aggregations are linear in total shingle count. No pair
    // space anywhere — this is the cheap corpus-level dedup signal that
    // runs BEFORE the quadratic candidate generators.
    QDef(
      "q_ext_boilerplate",
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, md5(array_to_string(ws[i:i+2], ' ')) AS gh
        |       FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
        |       WHERE len(ws) >= 3),
        |df AS (SELECT gh, count(*) AS df FROM sh GROUP BY gh)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS boiler_frac,
        |  CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) < 0.5 AS keep
        |FROM sh JOIN df USING (gh) GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), graft.ops.TextOps.words.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles(3)).as("g"))
        .select(col("doc_id"), md5(col("g")).as("gh"))
      // one explicit gh-repartition shared by the document-frequency
      // aggregation and the probe (stage reuse): the distinct-3-gram
      // explode + md5 runs once, not once per side
      val shP = sh.repartition(col("gh"))
      val df = shP.groupBy("gh").agg(count(lit(1)).as("df"))
      shP.join(df, Seq("gh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"))
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          (col("n_boiler").cast("double") / col("n_shingles").cast("double"))
            .as("boiler_frac"),
          (col("n_boiler").cast("double") / col("n_shingles").cast("double"))
            < 0.5 as "keep")
        .orderBy("doc_id")
    },

    // Normalization-aware dedup — the canonicalization step that runs
    // BEFORE exact hashing in every production pipeline (casefold,
    // punctuation → space, whitespace collapse, trim): two documents that
    // differ only in case/punct/spacing are the same training example, and
    // raw-byte dedup misses them. 25 planted variants (doc_id + 1,000,000 =
    // UPPER(text) + trailing "  !!") must collapse onto their originals.
    // Output per doc: its canonical (min) group member and group size.
    //
    // 100 TB posture: normalization is map-only string work inside the scan
    // stage; the ONLY shuffle key is the 16-byte md5 of the normalized
    // text (the q_ext_exact_dedup discipline — bodies never shuffle), and
    // the group stats join back on that same digest partitioning.
    QDef(
      "q_ext_text_norm",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) || '  !!'
        |  FROM documents WHERE doc_id < 25),
        |n AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |        lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nh
        |      FROM corpus),
        |g AS (SELECT nh, min(doc_id) AS canon_id, count(*) AS n_variants
        |      FROM n GROUP BY nh)
        |SELECT n.doc_id, g.canon_id, CAST(g.n_variants AS BIGINT) AS n_variants,
        |  n.doc_id = g.canon_id AS is_canon
        |FROM n JOIN g USING (nh) ORDER BY n.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text"))
      val norm = docs.unionByName(planted).withColumn("nh",
        md5(trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))))
        .select("doc_id", "nh")
      val grp = norm.groupBy("nh")
        .agg(min(col("doc_id")).as("canon_id"), count(lit(1)).as("n_variants"))
      norm.join(grp, Seq("nh"))
        .select(col("doc_id"), col("canon_id"), col("n_variants"),
          (col("doc_id") === col("canon_id")).as("is_canon"))
        .orderBy("doc_id")
    },

    // Exact SUB-document dedup (the RefinedWeb/C4 "exact substring /
    // duplicated paragraph removal" class — a different operator from every
    // doc-granularity dedup above: the unit of deduplication is a SEGMENT,
    // and documents get REWRITTEN, not dropped). Segments are fixed 8-word
    // grid chunks (this corpus has no paragraph marks); the planted variant
    // quotes the first 16 words (2 grid chunks) of each doc_id < 25 into a
    // new doc padded with unique filler — the op must strip exactly the
    // quoted chunks and keep the filler. First occurrence wins, ordered
    // (doc_id, ord): deterministic, order-independent.
    //
    // 100 TB posture: the first-occurrence group key is md5(segment), so
    // the shuffle carries 16-byte digests + (doc_id, ord) pairs — segment
    // BODIES only move in the reassembly shuffle, keyed by doc_id, which is
    // the output's own partitioning. Both shuffles are linear; no pair
    // space anywhere (contrast minhash: this is the exact tier of the
    // dedup ladder, run FIRST in real pipelines because it is cheapest).
    QDef(
      "q_ext_paragraph_dedup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    array_to_string(string_split(text, ' ')[1:16], ' ') || ' ' ||
        |    array_to_string(list_transform(range(0, 8),
        |      i -> 'u' || CAST(doc_id AS VARCHAR) || 'f' || CAST(i AS VARCHAR)), ' ')
        |  FROM documents WHERE doc_id < 25),
        |chunks AS (
        |  SELECT doc_id, CAST(k AS INTEGER) AS ord,
        |    array_to_string(ws[(k-1)*8+1 : k*8], ' ') AS seg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus) t,
        |       unnest(range(1, CAST(ceil(len(ws) / 8.0) AS BIGINT) + 1)) u(k)),
        |firsts AS (
        |  SELECT doc_id, ord, seg,
        |    row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, ord) AS rn
        |  FROM chunks)
        |SELECT doc_id, string_agg(seg, ' ' ORDER BY ord) AS kept_text,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM firsts WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(
            array_join(slice(split(col("text"), " "), 1, 16), " "), lit(" "),
            array_join(expr("transform(sequence(0, 7), " +
              "i -> concat('u', CAST(doc_id AS STRING), 'f', CAST(i AS STRING)))"),
              " ")).as("text"))
      val chunks = docs.unionByName(planted)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, CAST(ceil(size(ws) / 8.0) AS INT)),
            |  k -> struct(k AS ord, array_join(slice(ws, (k-1)*8+1, 8), ' ') AS seg))"""
            .stripMargin)).as("c"))
        .select(col("doc_id"), col("c.ord").as("ord"), col("c.seg").as("seg"))
      // first occurrence per segment digest: min (doc_id, ord) via one
      // digest-keyed aggregate joined back (bodies never cross this shuffle)
      val firsts = chunks.withColumn("h", md5(col("seg")))
        .groupBy("h").agg(min(struct(col("doc_id"), col("ord"))).as("keep"))
        .select(col("h"), col("keep.doc_id").as("doc_id"), col("keep.ord").as("ord"))
      chunks.withColumn("h", md5(col("seg")))
        .join(firsts, Seq("h", "doc_id", "ord"), "left_semi")
        .groupBy("doc_id")
        .agg(
          array_join(expr("transform(sort_array(collect_list(struct(ord, seg))), x -> x.seg)"),
            " ").as("kept_text"),
          count(lit(1)).as("n_kept"))
        .orderBy("doc_id")
    },
  ) :+ dataCardQ

  /** The data card (Gebru et al. "Datasheets for Datasets", the per-source
    * summary a dataset release ships): docs, tokens, language spread, size,
    * and the exact-duplicate burden — every quantity from the shared
    * contracts (TextOps.nWords tokenization, md5-window first-owner dedup),
    * in ONE grouped pass over a single corpus scan. Appended to `all` below. */
  private def dataCardQ: QDef = QDef(
    "q_ext_data_card",
    """WITH d AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks,
      |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
      |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        TextOps.nWords.as("n_toks"),
        row_number().over(w).as("rn"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        sum(when(col("rn") > 1, 1).otherwise(0)).as("n_dup_docs"))
      .orderBy("source")
  }

  /** Shared portable-MinHash pipeline (q_ext_minhash_jaccard +
    * q_ext_dedup_eval): planted-variant corpus (doc_id < 30 re-crawled with
    * a suffix probe), distinct word 3-shingles, 8 md5-derived minhashes
    * folded in ONE aggregation pass, 2×4 banding, banded candidate pairs
    * from per-band self-joins. One definition per engine — the estimator
    * and its evaluator must see the SAME candidates or the measured
    * precision/recall is fiction. Returns (shingles g, signatures sig,
    * candidate pairs cand(id_a, id_b, n_match)). */
  private def minhashPipeline(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val corpus = docs.unionByName(docs.filter(col("doc_id") < 30)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft dup probe")).as("text")))
    val g0 = corpus.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(TextOps.shingles(3)).as("sh"))
    // the returned g carries ONE explicit doc_id exchange that every direct
    // consumer (sizes / intersection probes) shares via stage reuse — the
    // shingle explode runs once for all of them instead of once per use;
    // sig stays on the RAW explode so its 8 md5-min aggregates keep their
    // map-side partial combine (per-doc partials, not shingles, shuffle)
    val g = g0.repartition(col("doc_id"))
    val sigAggs = (0 until 8).map(i =>
      min(substring(md5(concat(lit(s"$i|"), col("sh"))), 1, 16)).as(s"m$i"))
    val sig = g0.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      .withColumn("band0", concat_ws("|", col("m0"), col("m1"), col("m2"), col("m3")))
      .withColumn("band1", concat_ws("|", col("m4"), col("m5"), col("m6"), col("m7")))
    def pairs(band: String) = sig.as("a").join(sig.as("b"),
        col(s"a.$band") === col(s"b.$band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (0 until 8).map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("n_match"))
    val cand = pairs("band0").unionByName(pairs("band1"))
      .groupBy("id_a", "id_b").agg(max("n_match").as("n_match"))
    (g, sig, cand)
  }

  /** DuckDB side of [[minhashPipeline]]: CTEs corpus, w, g, seeds, sig,
    * bands, cand — shared verbatim by both consumers' oracles. */
  /** Distributed connected components by min-label propagation with pointer
    * jumping, shared by q_ext_dedup_clusters and q_ext_dedup_e2e. Input:
    * directed edges (src, dst) — the symmetric closure is materialized
    * here — and the node relation (id). Output: (id, comp) with comp = the
    * component's min node id (the unique fixpoint, hence oracle-able).
    *
    * 100 TB posture: per round ONE shuffle join (edges ⋈ labels) + one
    * min-groupBy + the pointer-jump self-join; IterCkpt truncates the
    * growing lineage each round AND frees the superseded round's blocks
    * (only the final frame stays pinned). Convergence is a ONE-ROW
    * DECIMAL(38,0) aggregate — labels only decrease, so Σcomp strictly
    * decreases until the fixpoint; the driver never sees data rows.
    * Pointer jumping doubles label distance per round → O(log diameter)
    * rounds, not O(diameter). */
  private[graft] def ccMinLabel(fwd: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ccMinLabelImpl(fwd, Some(nodes))

  /** [[ccMinLabel]] over the edge endpoints alone (no isolated nodes): the
    * node relation derives from the CHECKPOINTED symmetric closure instead
    * of re-evaluating the caller's (possibly expensive) edge pipeline. */
  private[graft] def ccMinLabel(fwd: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = ccMinLabelImpl(fwd, None)

  private def ccMinLabelImpl(fwd: org.apache.spark.sql.DataFrame,
      nodesOpt: Option[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    val s = fwd.sparkSession
    // IterCkpt each round: an iterative plan that nests its predecessor
    // grows exponentially and blows up analysis long before the DATA is
    // large — truncating the lineage keeps every round's plan flat
    val (edges, edgeIds) = graft.IterCkpt.step(fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst"))))
    var labels: org.apache.spark.sql.DataFrame = null
    var labelIds: Seq[Int] = Nil
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var round = 0
    while (!converged && round < 50) {
      // round 0 folds the IDENTITY initial labels straight into the
      // propagation (comp := src) — no initial label frame, its checkpoint,
      // or the first round's join; later rounds join the checkpointed
      // labels as before. Without a caller node relation the self label
      // folds as least(id, min neighbor) over the closure alone (every
      // endpoint occurs as a dst), which also avoids unioning two
      // projections of the SAME checkpoint instance (Union's constraint
      // rewrite cannot handle the shared attribute ids).
      val hopIn =
        if (labels != null)
          labels.unionByName(edges.join(labels, col("src") === col("id"))
              .select(col("dst").as("id"), col("comp")))
            .groupBy("id").agg(min("comp").as("comp"))
        else nodesOpt match {
          case Some(nodes) =>
            nodes.select(col("id"), col("id").as("comp"))
              .unionByName(edges.select(col("dst").as("id"), col("src").as("comp")))
              .groupBy("id").agg(min("comp").as("comp"))
          case None =>
            edges.select(col("dst").as("id"), col("src").as("comp"))
              .groupBy("id").agg(min("comp").as("mc"))
              .select(col("id"), least(col("mc"), col("id")).as("comp"))
        }
      // materialize the hop before the self-join below — a lazy `hop`
      // would embed (and can re-execute) the propagation join + min
      // aggregate on BOTH sides of that join every round
      val (hop, hopIds) = graft.IterCkpt.step(hopIn)
      // pointer jumping: follow the label's own label (comp := comp[comp],
      // a label is always a node id)
      // x.id stays UNALIASED: re-aliasing it makes the checkpoint capture a
      // constraint on the pre-alias attribute, which the next round's Union
      // constraint rewrite cannot map (strict AttributeMap) and throws
      val (lck, lids) = graft.IterCkpt.step(hop.as("x")
        .join(hop.as("y"), col("x.comp") === col("y.id"), "left")
        .select(col("x.id"),
          least(col("x.comp"), coalesce(col("y.comp"), col("x.comp"))).as("comp")),
        labelIds ++ hopIds)
      labels = lck
      labelIds = lids
      val sumNow = labels.agg(sum(col("comp").cast("decimal(38,0)")))
        .head.getDecimal(0)
      converged = prevSum != null && prevSum.compareTo(sumNow) == 0
      prevSum = sumNow
      round += 1
    }
    // the final labels frame is self-contained — the edges can go
    graft.IterCkpt.free(s, edgeIds)
    labels
  }

  private def minhashCtes: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graft dup probe' FROM documents WHERE doc_id < 30),
      |w AS (SELECT doc_id, string_split(text,' ') AS ws FROM corpus),
      |g AS (SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
      |        i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]))) AS sh
      |      FROM w WHERE len(ws) >= 3),
      |seeds AS (SELECT unnest(range(0, 8)) AS seed),
      |sig AS (SELECT doc_id, seed, min(substring(md5(CAST(seed AS VARCHAR) || '|' || sh), 1, 16)) AS mh
      |        FROM g, seeds GROUP BY 1, 2),
      |bands AS (SELECT doc_id, seed // 4 AS band,
      |            string_agg(mh, '|' ORDER BY seed) AS bsig
      |          FROM sig GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)""".stripMargin

  /** The PageRank recurrence shared by q_ext_pagerank and PropertySpec's
    * random-graph reference check. Input: a DIRECTED distinct edge frame
    * (src, dst); the symmetric closure is materialized (and DEDUPED — an
    * input already containing a reciprocal pair must not double its
    * edge weight) here. Output:
    * (id, pr) integer micro-ranks after `iters` rounds of
    * pr' = (15000000 + 85·Σ(pr div outdeg)) div 100. Per round: ONE
    * shuffle join (outdeg pre-folded onto the edges) + a map-side-combined
    * long sum; IterCkpt truncates lineage and frees superseded rounds. */
  def pageRankMicro(e0: org.apache.spark.sql.DataFrame, iters: Int,
      reciprocalFree: Boolean = false): org.apache.spark.sql.DataFrame = {
    val s = e0.sparkSession
    val sym = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    // the symmetric closure must be DEDUPED (an input already containing a
    // reciprocal pair must not double its edge weight) — unless the caller
    // PROVES forward and reversed copies cannot collide (reciprocalFree),
    // in which case the second distinct is a wasted full exchange+agg
    val edges = if (reciprocalFree) sym else sym.distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .withColumnRenamed("src", "id")
    // fold outdeg onto the edge relation once: each iteration then needs
    // only the single edges⋈ranks join
    val (edgesD, edgeIds) = graft.IterCkpt.step(
      edges.join(deg, edges("src") === deg("id"))
        .select(col("src"), col("dst"), col("outdeg")))
    def aggNext(contrib: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      contrib.groupBy("dst")
        .agg(expr("CAST((15000000 + 85 * sum(c)) div 100 AS BIGINT)").as("pr"))
        .withColumnRenamed("dst", "id")
    // round 1 folds the CONSTANT initial rank (1e6 micros on every node)
    // straight over the checkpointed edge relation — the rank frame, its
    // checkpoint, the round's join and its broadcast all drop out; the key
    // set is unchanged (symmetric edges ⇒ distinct dst = distinct src).
    // iters = 0 keeps the explicit initial frame.
    var (pr, prIds) =
      if (iters == 0)
        graft.IterCkpt.step(deg.select(col("id"), lit(1000000L).as("pr")))
      else
        graft.IterCkpt.step(aggNext(edgesD.select(col("dst"),
          expr("CAST(1000000 AS BIGINT) div outdeg").as("c"))))
    for (_ <- 2 to iters) {
      val next = aggNext(edgesD.join(pr, edgesD("src") === pr("id"))
        .select(col("dst"), expr("pr div outdeg").as("c")))
      val (ck, ids) = graft.IterCkpt.step(next, prIds)
      pr = ck
      prIds = ids
    }
    // the final frame is checkpointed — it no longer reads the edges
    graft.IterCkpt.free(s, edgeIds)
    pr
  }

  /** DuckDB oracle for q_ext_pagerank: the identical integer micro-rank
    * recurrence unrolled as chained CTEs (fixed 5 iterations — recursive
    * CTEs cannot aggregate in the recursive term, and a fixed unroll is the
    * deterministic contract anyway). */
  private def pagerankSql: String = {
    val iters = 5
    val head =
      """e0 AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY 1),
        |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM deg)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""pr$k AS (SELECT e.dst AS id,
         |  CAST((15000000 + 85 * SUM(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr
         |  FROM e JOIN pr${k - 1} p ON p.id = e.src JOIN deg d ON d.id = e.src
         |  GROUP BY e.dst)""".stripMargin
    }
    s"""WITH ${(head +: steps).mkString(",\n")}
       |SELECT id AS node_id,
       |  CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       |  id // 2 AS key, pr AS pr_micro
       |FROM pr$iters ORDER BY pr_micro DESC, node_id LIMIT 100""".stripMargin
  }
}
