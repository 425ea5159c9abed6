package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators beyond the dedup/similarity/text families
  * (builder prompt north star: "the operations a large-scale training-data
  * pipeline would need").
  *
  * Design rules for 100 TB inputs:
  *  - Sampling/splitting is HASH-based (md5 of a key), never `rand()`: the
  *    decision is reproducible per row, needs no driver state or seed
  *    broadcast, survives retries/speculative execution, and never shuffles —
  *    it is a map-only filter that parquet scans stream through.
  *  - Group-aware splitting keys on the GROUP (source), not the row, so all
  *    rows of a group land on one side (no train/test leakage) without any
  *    join — the group key is hashed per row.
  *  - Packing/quality scoring are single window or single groupBy passes;
  *    everything aggregates integers exactly (word counts), with at most one
  *    final double division for ratios (bit-identical across engines).
  */
object Pipeline {

  /** Two-hex-char selector in [00,ff] from a key column: uniform, stable,
    * engine-portable (md5 lowercase hex on both sides). */
  private def sel2(c: org.apache.spark.sql.Column) =
    substring(md5(c.cast("string")), 1, 2)

  val all: Seq[QDef] = Seq(
    // Stratified sampling: per-language keep rates (en ≈ 50%, rest ≈ 20%)
    // decided by a hash of the doc id — the standard down/up-weighting step
    // when rebalancing a web corpus by language or domain.
    QDef(
      "q_ext_stratified_sample",
      """SELECT doc_id, lang, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sel
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |      < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      docs.select(col("doc_id"), col("lang"), sel2(col("doc_id")).as("sel"))
        .filter(col("sel") < when(col("lang") === "en", "80").otherwise("33"))
        .orderBy("doc_id")
    },

    // Group-aware train/test split: the hash is of the SOURCE, so every doc
    // of a source lands on the same side — no near-duplicate leakage across
    // the split. ~10% of sources become test.
    QDef(
      "q_ext_group_split",
      """SELECT doc_id, source,
        |  CASE WHEN substring(md5(source), 1, 2) < '1a' THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          when(substring(md5(col("source")), 1, 2) < "1a", "test")
            .otherwise("train").as("split"))
        .orderBy("doc_id")
    },

    // Deterministic k-per-group sample (distributed reservoir analog): order
    // each stratum by a hash of the id and keep the first k — one shuffle by
    // the stratum key, no driver-side state, same k rows on every rerun.
    QDef(
      "q_ext_reservoir_per_group",
      """SELECT lang, doc_id, rk FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang")
        .orderBy(substring(md5(col("doc_id").cast("string")), 1, 8), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), row_number().over(w).as("rk"))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES): each
    // doc draws u from a DETERMINISTIC per-id scramble (Fibonacci-hash →
    // (0,1), exact power-of-two scaling on both engines) and ranks by
    // u^(1/w), w = doc length — the one-pass, shuffle-once distributed
    // answer to "sample k docs per stratum proportional to length". The
    // selected SET is what matters (and is pinned); the key itself never
    // leaves the plan, so cross-engine pow() ulps cannot touch the hash
    // compare, and ordering flips would need two keys within one ulp.
    QDef(
      "q_ext_weighted_sample",
      // the Knuth hash (id·2654435761 mod 2³²) via SPLIT multiplication:
      // id·b would overflow ANSI BIGINT once ids reach ~3.5e9 (the 10×
      // scale smoke caught exactly this), so multiply by b's 16-bit halves
      // under mod-2³² — exact modular arithmetic, bit-identical u at every
      // scale, and every intermediate stays < 2.9e14
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(length(text) AS BIGINT) AS w,
        |    (((doc_id % 4294967296) * 31153 % 4294967296
        |      + ((doc_id % 4294967296) * 40503 % 4294967296) * 65536 % 4294967296)
        |     % 4294967296 + 0.5) / 4294967296 AS u
        |  FROM documents)
        |SELECT lang, doc_id, w FROM (
        |  SELECT lang, doc_id, w,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY pow(u, 1.0 / w) DESC, doc_id) AS rk
        |  FROM t) s
        |WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val m = 4294967296L // 2654435761 = 40503·65536 + 31153
      val am = col("doc_id") % m
      val u32 = (am * 31153L % m + (am * 40503L % m) * 65536L % m) % m
      val u = (u32.cast("double") + 0.5) / 4294967296.0
      val w = length(col("text")).cast("long")
      val key = pow(u, lit(1.0) / w.cast("double"))
      val win = Window.partitionBy("lang").orderBy(key.desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), w.as("w"),
          row_number().over(win).as("rk"))
        .filter(col("rk") <= 5).drop("rk")
        .orderBy("lang", "doc_id")
    },

    // Gopher-style document quality gate: word-count bounds + mean-word-length
    // bounds (Rae et al. 2021 §A1.1 heuristics), computed scan-side with
    // exact integer arithmetic and one final division.
    QDef(
      "q_ext_gopher_quality",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letter_chars
        |  FROM documents)
        |SELECT doc_id, n_words,
        |  CAST(n_letter_chars AS DOUBLE) / nullif(n_words, 0) AS mean_wlen,
        |  (n_words BETWEEN 10 AND 300
        |   AND CAST(n_letter_chars AS DOUBLE) / nullif(n_words, 0)
        |       BETWEEN 2.0 AND 12.0) AS keep
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nWords = TextOps.nWords
      val nChars = length(regexp_replace(col("text"), " ", "")).cast("long")
      val meanW = nChars.cast("double") / nullif(nWords, lit(0L))
      Tables.documents(s, d)
        .select(col("doc_id"), nWords.as("n_words"), meanW.as("mean_wlen"),
          (nWords.between(10, 300) && meanW.between(2.0, 12.0)).as("keep"))
        .orderBy("doc_id")
    },

    // Repetition filter (Gopher §A1.1 "repetitive text"): fraction of the
    // doc taken by its single most frequent word. Two exact integer
    // aggregations, one double ratio.
    QDef(
      "q_ext_repetition_filter",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (SELECT doc_id, word, count(*) AS cnt FROM w
        |      WHERE word <> '' GROUP BY doc_id, word)
        |SELECT doc_id, max(cnt) AS top_freq,
        |  CAST(sum(cnt) AS BIGINT) AS n_words,
        |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS rep_ratio,
        |  (CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) <= 0.2) AS keep
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(max("cnt").as("top_freq"), sum("cnt").as("n_words"))
        .select(col("doc_id"), col("top_freq"), col("n_words"),
          (col("top_freq").cast("double") / col("n_words")).as("rep_ratio"),
          (col("top_freq").cast("double") / col("n_words") <= 0.2).as("keep"))
        .orderBy("doc_id")
    },

    // Corpus vocabulary: global top-50 tokens by frequency (count desc, word
    // asc tiebreak) — the tokenizer-training / vocab-audit pass. Partial
    // (map-side) aggregation makes the shuffle carry only distinct words.
    QDef(
      "q_ext_vocab_topk",
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(50)
    },

    // Sequence packing: assign documents to fixed-capacity (4096-token) bins
    // by cumulative token count in doc order — the pretraining batch-packing
    // step. The prefix sum is TWO-PASS so it parallelizes: (1) cumsum within
    // doc_id-range shards (a PARTITIONED window — every shard in parallel);
    // (2) a window over the per-shard TOTALS (one row per shard: thousands
    // of rows where the corpus has billions) yields each shard's starting
    // offset, broadcast back. Identical math to a global cumsum — a global
    // `Window.orderBy` funnels the entire corpus through ONE task.
    QDef(
      "q_ext_seq_packing",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, start_offset,
        |  start_offset // 4096 AS bin_id
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      packAssignments(Tables.documents(s, d)).orderBy("doc_id")
    },

    // Materialize the packed training sequences — the step after bin
    // ASSIGNMENT: each bin's documents concatenate in doc order into one
    // training row (emitted here as the md5 of the packed text plus exact
    // token/doc counts, so the dump stays small while pinning the content
    // byte-for-byte). The body shuffle is keyed by bin_id, and a bin's
    // payload is CAPACITY-BOUNDED (4096 tokens + one overflow doc), so the
    // per-group state can never grow with the corpus — the collect_list
    // here is safe where a per-bucket collect_list in dedup was not.
    QDef(
      "q_ext_pack_concat",
      """WITH t AS (SELECT doc_id, text,
        |    CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, text, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_offset
        |  FROM t)
        |SELECT start_offset // 4096 AS bin_id, count(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  md5(string_agg(text, ' ' ORDER BY doc_id)) AS content_md5
        |FROM c GROUP BY 1 ORDER BY bin_id""".stripMargin) { (s, d) =>
      packAssignments(Tables.documents(s, d))
        .join(Tables.documents(s, d).select("doc_id", "text"), Seq("doc_id"))
        .groupBy("bin_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          md5(concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(doc_id, text))), x -> x.text)")))
            .as("content_md5"))
        .orderBy("bin_id")
    },

    // Quality-percentile filter: keep each language's top half by length —
    // the per-stratum percentile gate corpora apply per language/domain so
    // one verbose stratum cannot crowd out the rest. percent_rank is
    // RANK-based ((rank-1)/(n-1), a small-int division), so unlike
    // value-percentile cuts over double aggregates it is bit-identical
    // across engines. One shuffle by the stratum key.
    QDef(
      "q_ext_quality_percentile",
      """SELECT doc_id, lang, n_chars, pr FROM (
        |  SELECT doc_id, lang, n_chars,
        |    percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS pr
        |  FROM documents) t
        |WHERE pr >= 0.5 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          percent_rank().over(w).as("pr"))
        .filter(col("pr") >= 0.5)
        .orderBy("doc_id")
    },

    // PII scrubbing: redact digit runs in the event payloads and count what
    // was removed — the map-only compliance pass (regex fully distributed,
    // no shuffle). DuckDB needs the 'g' flag for global replace; Spark
    // replaces globally by default.
    QDef(
      "q_ext_pii_scrub",
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
        |  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
        |       AS INTEGER) AS n_digits
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("scrubbed"),
          (length(col("props")) -
            length(regexp_replace(col("props"), "[0-9]", ""))).as("n_digits"))
        .orderBy("event_id")
    },

    // Column profiling — the per-column completeness/cardinality/range
    // audit (the ANALYZE-shape data-quality pass every ingest pipeline runs
    // before training). Two column-disjoint passes that together read each
    // column once: the numeric/timestamp columns in ONE multi-distinct
    // 17-expression aggregation (all-primitive buffers → HashAggregate
    // throughout), the string columns through a hash-keyed value census
    // whose |distinct|-bounded output feeds the only string min/max. The
    // double column renders min/max through DECIMAL(18,2) (exact for
    // 2-decimal prices, identical text on both engines); the timestamp
    // renders in session-UTC. Scale knob: the exact count-distincts expand
    // the numeric scan 5-fold (Spark's Expand); at corpus scale swap them
    // for approx_count_distinct and keep the single pass.
    QDef(
      "q_ext_null_profile",
      """SELECT 'o_custkey' AS col, count(*) AS n_rows, count(o_custkey) AS n_nonnull,
        |       count(DISTINCT o_custkey) AS n_distinct,
        |       CAST(min(o_custkey) AS VARCHAR) AS min_v, CAST(max(o_custkey) AS VARCHAR) AS max_v FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(o_orderdate), count(DISTINCT o_orderdate),
        |       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*), count(o_orderkey), count(DISTINCT o_orderkey),
        |       CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(o_orderpriority), count(DISTINCT o_orderpriority),
        |       min(o_orderpriority), max(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(o_orderstatus), count(DISTINCT o_orderstatus),
        |       min(o_orderstatus), max(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice),
        |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        |ORDER BY col""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      def stats(c: String, suf: String) = Seq(
        count(col(c)).as(s"nn_$suf"), countDistinct(col(c)).as(s"nd_$suf"),
        min(col(c)).as(s"mn_$suf"), max(col(c)).as(s"mx_$suf"))
      // The numeric/timestamp columns profile in ONE multi-distinct pass
      // whose aggregation buffers are all PRIMITIVE, so the whole Expand
      // pipeline stays HashAggregate (min/max over a STRING column has a
      // non-mutable buffer and demotes the entire 25-function aggregate to
      // an interpreted SortAggregate — measured 3.3× this plan's cost).
      val g = o.agg(count(lit(1)).as("n"),
        (stats("o_orderkey", "ok") ++ stats("o_custkey", "ck") ++
          stats("o_totalprice", "tp") ++ stats("o_orderdate", "od")): _*)
      val numRows = g.selectExpr(
        """stack(4,
          |  'o_custkey', n, nn_ck, nd_ck, CAST(mn_ck AS STRING), CAST(mx_ck AS STRING),
          |  'o_orderdate', n, nn_od, nd_od, CAST(mn_od AS STRING), CAST(mx_od AS STRING),
          |  'o_orderkey', n, nn_ok, nd_ok, CAST(mn_ok AS STRING), CAST(mx_ok AS STRING),
          |  'o_totalprice', n, nn_tp, nd_tp,
          |    CAST(CAST(mn_tp AS DECIMAL(18,2)) AS STRING),
          |    CAST(CAST(mx_tp AS DECIMAL(18,2)) AS STRING)
          |) AS (col, n_rows, n_nonnull, n_distinct, min_v, max_v)""".stripMargin)
      // The string columns profile through a (col, value) census — string
      // GROUP KEYS hash fine, the census partial-combines map-side to
      // |distinct values| rows, and the string min/max (the SortAggregate)
      // runs over THAT bounded relation, never the corpus. The two passes
      // prune to disjoint column sets, so together they read each column
      // exactly once.
      val pairs = o.select(explode(array(
          struct(lit("o_orderstatus").as("c"), col("o_orderstatus").as("v")),
          struct(lit("o_orderpriority").as("c"), col("o_orderpriority").as("v")))).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
      val strRows = pairs.groupBy("c", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("c").agg(sum("cnt").as("n_rows"),
          sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n_nonnull"),
          count("v").as("n_distinct"), min("v").as("min_v"), max("v").as("max_v"))
        .select(col("c").as("col"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_v"), col("max_v"))
      numRows.unionByName(strRows).orderBy("col")
    },

    // Deterministic global training-order shuffle: every epoch-0 data order
    // in a large-scale run is "sort by a keyed hash", never rand() — the
    // permutation is reproducible per row, survives retries, and resharding
    // to N output files is just range-partitioning the sort. At 100 TB this
    // is ONE range-shuffle (sampled boundaries + total sort), the minimum
    // any global permutation costs; changing the salt re-deals the order.
    QDef(
      "q_ext_global_shuffle",
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS shuffle_key,
        |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch0'), doc_id)
        |    AS train_pos
        |FROM documents ORDER BY train_pos""".stripMargin) { (s, d) =>
      // the position column reuses the packAssignments shard trick: a global
      // row_number would funnel the corpus through one window task, so the
      // rank is composed from per-shard ranks + broadcast shard offsets —
      // same two-pass prefix-sum discipline, keyed on the hash's first byte
      // (256 shards, each ~N/256 rows)
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":epoch0"))).as("shuffle_key"))
        .withColumn("shard", substring(col("shuffle_key"), 1, 2))
      val wIntra = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
      val wShard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = hashed.groupBy("shard").agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(sum("n").over(wShard), lit(0L)))
        .select("shard", "off")
      hashed.withColumn("rk", row_number().over(wIntra))
        .join(broadcast(offsets), Seq("shard"))
        .select(col("doc_id"), col("shuffle_key"),
          (col("off") + col("rk")).as("train_pos"))
        .orderBy("train_pos")
    },

    // Span-level exact substring dedup (the "Deduplicating Training Data
    // Makes Language Models Better" operator): hash a 40-char window every
    // 10 chars, keep windows whose hash appears in MORE THAN ONE document,
    // and report per document how many window starts are duplicated — the
    // span map a rewrite pass would cut. Linear in corpus size: the shuffle
    // key is the 8-hex window digest (4 B of entropy, never the text); the
    // cross-doc test is one two-level aggregation, no pair space, no
    // suffix array. Stride 10 bounds the blowup at ~n_chars/10 rows.
    QDef(
      "q_ext_dup_spans",
      """WITH win AS (
        |  SELECT doc_id,
        |    substring(md5(substring(text, CAST(1 + (i - 1) * 10 AS INTEGER), 40)), 1, 8) AS wh
        |  FROM documents, range(1, 2000) r(i)
        |  WHERE (i - 1) * 10 + 40 <= length(text)),
        |dup AS (SELECT wh FROM win GROUP BY wh
        |        HAVING count(DISTINCT doc_id) > 1)
        |SELECT w.doc_id,
        |  CAST(count(*) AS BIGINT) AS dup_windows,
        |  CAST(count(DISTINCT w.wh) AS BIGINT) AS dup_distinct
        |FROM win w JOIN dup USING (wh)
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      val win = strideWindows(Tables.documents(s, d))
      joinDupWindows(win)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("dup_windows"),
          countDistinct("wh").as("dup_distinct"))
        .orderBy("doc_id")
    },

    // The rewrite-side companion of q_ext_dup_spans: merge each document's
    // duplicated windows into maximal islands (classic interval union via a
    // running-max window) and report the exact duplicated-char coverage a
    // span-cut rewrite would remove. All integer arithmetic; the per-doc
    // window partitions by doc_id, so no task ever sees more than one
    // document's spans — linear at any corpus size.
    QDef(
      "q_ext_dup_coverage",
      """WITH win AS (
        |  SELECT doc_id, CAST(1 + (i - 1) * 10 AS INTEGER) AS start,
        |    substring(md5(substring(text, CAST(1 + (i - 1) * 10 AS INTEGER), 40)), 1, 8) AS wh
        |  FROM documents, range(1, 2000) r(i)
        |  WHERE (i - 1) * 10 + 40 <= length(text)),
        |dup AS (SELECT wh FROM win GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
        |spans AS (SELECT w.doc_id, w.start FROM win w JOIN dup USING (wh)),
        |isl AS (
        |  SELECT doc_id, start,
        |    CASE WHEN max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start > max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_isl
        |  FROM spans),
        |isl2 AS (SELECT doc_id, start,
        |    sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |lens AS (SELECT doc_id, island, max(start + 40) - min(start) AS len
        |  FROM isl2 GROUP BY doc_id, island)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS dup_chars,
        |  CAST(count(*) AS BIGINT) AS n_islands
        |FROM lens GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      dupIslands(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(sum(col("e") - col("s")).cast("long").as("dup_chars"),
          count(lit(1)).as("n_islands"))
        .orderBy("doc_id")
    },

    // The rewrite itself: cut every duplicated island out of the affected
    // documents and emit the surviving text's length + digest. The Spark
    // side folds the per-doc sorted island array ONCE over the original
    // string (a codegen'd `aggregate` HOF — no per-char explosion); the
    // oracle rebuilds the same string char-by-char with an anti-exists
    // filter, so the two constructions cross-check each other. Per-doc
    // island arrays are window-count-bounded (≤ n_chars/10), never
    // corpus-sized; affected docs only, inner-joined.
    QDef(
      "q_ext_dedup_rewrite",
      """WITH win AS (
        |  SELECT doc_id, CAST(1 + (i - 1) * 10 AS INTEGER) AS start,
        |    substring(md5(substring(text, CAST(1 + (i - 1) * 10 AS INTEGER), 40)), 1, 8) AS wh
        |  FROM documents, range(1, 2000) r(i)
        |  WHERE (i - 1) * 10 + 40 <= length(text)),
        |dup AS (SELECT wh FROM win GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
        |spans AS (SELECT w.doc_id, w.start FROM win w JOIN dup USING (wh)),
        |isl AS (
        |  SELECT doc_id, start,
        |    CASE WHEN max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start > max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_isl
        |  FROM spans),
        |isl2 AS (SELECT doc_id, start,
        |    sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |isl3 AS (SELECT doc_id, island, min(start) AS s, max(start + 40) AS e
        |  FROM isl2 GROUP BY doc_id, island),
        |chars AS (
        |  SELECT d.doc_id, CAST(i AS INTEGER) AS pos,
        |    substring(d.text, CAST(i AS INTEGER), 1) AS ch
        |  FROM documents d, range(1, 2000) r(i)
        |  WHERE i <= length(d.text)
        |    AND d.doc_id IN (SELECT DISTINCT doc_id FROM isl3)),
        |agg AS (
        |  SELECT c.doc_id,
        |    coalesce(string_agg(ch, '' ORDER BY pos) FILTER (WHERE NOT EXISTS (
        |      SELECT 1 FROM isl3 x
        |      WHERE x.doc_id = c.doc_id AND c.pos >= x.s AND c.pos < x.e)), '')
        |      AS clean
        |  FROM chars c GROUP BY c.doc_id)
        |SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len,
        |  md5(clean) AS clean_md5
        |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      spanCutRewrite(Tables.documents(s, d))
        .select(col("doc_id"), length(col("clean")).cast("long").as("clean_len"),
          md5(col("clean")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // Alignment-ROBUST span dedup (mod-p / content-defined fingerprinting):
    // hash the 40-gram at EVERY position and keep the ~1/8 whose digest
    // starts with hex 0 or 8 — the selection depends on window CONTENT, not
    // grid position, so two copies of a block fingerprint identically at
    // ANY offset (the alignment-congruence gap of the strided grid,
    // documented on q_ext_dup_spans, closed). Still linear: the 8× denser
    // window stream immediately drops to a 1/8 sample BEFORE the shuffle —
    // a map-side filter — and the dup test/island union are the same
    // digest-keyed stages as the strided family.
    QDef(
      "q_ext_dup_spans_robust",
      """WITH win AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS start,
        |    substring(md5(substring(text, CAST(i AS INTEGER), 40)), 1, 8) AS wh
        |  FROM documents, range(1, 2000) r(i)
        |  WHERE i + 40 - 1 <= length(text)),
        |sam AS (SELECT * FROM win WHERE substring(wh, 1, 1) IN ('0', '8')),
        |dup AS (SELECT wh FROM sam GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
        |spans AS (SELECT s.doc_id, s.start FROM sam s JOIN dup USING (wh)),
        |isl AS (
        |  SELECT doc_id, start,
        |    CASE WHEN max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start > max(start + 40) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_isl
        |  FROM spans),
        |isl2 AS (SELECT doc_id, start,
        |    sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |lens AS (SELECT doc_id, island, max(start + 40) - min(start) AS len
        |  FROM isl2 GROUP BY doc_id, island)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS dup_chars,
        |  CAST(count(*) AS BIGINT) AS n_islands
        |FROM lens GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val win = sampledWindows(Tables.documents(s, d))
      islandUnion(joinDupWindows(win).select("doc_id", "start"))
        .groupBy("doc_id")
        .agg(sum(col("e") - col("s")).cast("long").as("dup_chars"),
          count(lit(1)).as("n_islands"))
        .orderBy("doc_id")
    },
  )

  /** Every-position 40-gram digests, mod-p sampled to ~1/8 by the digest's
    * leading hex nibble — content-defined selection, so two copies of a
    * block fingerprint identically at ANY offset (alignment-robust, unlike
    * [[strideWindows]]' fixed grid). The sample filter is map-side: the 8×
    * denser window stream never reaches a shuffle. */
  private[graft] def sampledWindows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(length(col("text")) >= 40)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, cast(length(text) - 39 as int))," +
          " i -> substring(md5(substring(text, i, 40)), 1, 8))")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("start"),
        col("col").as("wh"))
      .filter(substring(col("wh"), 1, 1).isin("0", "8"))

  // ---- shared span-dedup pipeline (q_ext_dup_spans / _dup_coverage /
  // ---- _dedup_rewrite + PropertySpec's planted-block check) ---------------

  /** Strided 40-char/step-10 window digests of a (doc_id, text) frame:
    * one row per window as (doc_id, start, wh) with `start` 1-based and
    * `wh` the first 8 hex of the window's md5. One codegen'd pass; docs
    * shorter than one window have no rows (and Spark's `sequence` would
    * count DOWN for an empty range — filter first, don't clamp). */
  private[graft] def strideWindows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(length(col("text")) >= 40)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, cast((length(text) - 40) div 10 + 1 as int))," +
          " i -> substring(md5(substring(text, 1 + (i - 1) * 10, 40)), 1, 8))")))
      .select(col("doc_id"), (col("pos") * 10 + 1).cast("int").as("start"),
        col("col").as("wh"))

  /** Digests appearing in MORE THAN ONE document — the cross-doc duplication
    * test as a two-level agg on the 8-hex digest only (never the text). */
  private[graft] def dupDigests(win: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    win.groupBy("wh").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1).select("wh")

  /** Interval union of per-doc 40-char window starts (doc_id, start) into
    * maximal disjoint islands via a per-doc running-max window: one row per
    * island as (doc_id, island, s, e) covering chars [s, e). */
  private[graft] def islandUnion(spans: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("start")
    val prevEnd = max(col("start") + 40)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("new_isl",
        when(prevEnd.isNull || col("start") > prevEnd, 1).otherwise(0))
      .withColumn("island",
        sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("start").as("s"), (max(col("start") + 40)).as("e"))
  }

  /** Each doc's strided duplicated windows merged into islands — the shared
    * core of the dup-span family. */
  private[graft] def dupIslands(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val win = strideWindows(docs)
    islandUnion(joinDupWindows(win).select("doc_id", "start"))
  }

  /** Windows joined to their cross-doc dup digests with the window stream
    * computed ONCE: an explicit wh-repartition becomes one shared exchange
    * that BOTH the dup-digest aggregation (hash(wh) satisfies every
    * clustering the distinct-agg chain needs) and the probe side consume —
    * Spark's exchange reuse materializes the digest pass a single time,
    * halving the dominant per-position md5 CPU and dropping the agg side's
    * two private exchanges. Shuffles only (doc_id, start, 8-hex digest)
    * rows — never text — so the trade holds at any corpus size. */
  private[graft] def joinDupWindows(win: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val winP = win.repartition(col("wh"))
    winP.join(dupDigests(winP), "wh")
  }

  /** Affected docs with their duplicated islands cut out: (doc_id, clean).
    * The fold walks each doc's SORTED bounded island array once over the
    * original string — a codegen'd `aggregate` HOF, no per-char explosion. */
  private[graft] def spanCutRewrite(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val islands = dupIslands(docs)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("isl"))
    docs.join(islands, "doc_id")
      .withColumn("clean", expr(
        // fold the sorted disjoint islands left-to-right: keep the gap
        // before each island, then the tail after the last one
        "aggregate(isl, struct(1 as pos, '' as acc)," +
          " (st, iv) -> struct(iv.e as pos," +
          "   concat(st.acc, substring(text, st.pos, iv.s - st.pos)) as acc)," +
          " st -> concat(st.acc, substring(text, st.pos)))"))
  }

  /** The two-pass prefix-sum bin assignment shared by q_ext_seq_packing,
    * q_ext_pack_concat and examples.CurationFlow: takes any (doc_id, text)
    * frame, returns (doc_id, n_tokens, start_offset, bin_id).
    *
    * Shard key must be MONOTONE in doc_id so concatenating shards in shard
    * order replays the global doc order. The width ADAPTS to the corpus
    * (≤ ~8k shards at any size): a constant width would make the
    * shard-offsets relation corpus-proportional and sneak the single-task
    * bottleneck back in through the offsets window. Output is
    * width-invariant (same global cumsum either way); the count() on the
    * raw table is a parquet-metadata read, not a scan. */
  private[graft] def packAssignments(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val width = math.max(1024L, docs.count() / 8192L)
    val toks = docs
      .select(col("doc_id"), TextOps.nWords.as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $width"))
    val wIntra = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wShard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("shard").agg(sum("n_tokens").as("shard_total"))
      .withColumn("shard_off", coalesce(sum("shard_total").over(wShard), lit(0L)))
      .select("shard", "shard_off")
    toks.withColumn("cum", sum("n_tokens").over(wIntra))
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("start_offset", col("cum") - col("n_tokens") + col("shard_off"))
      .withColumn("bin_id", expr("start_offset div 4096"))
      .select("doc_id", "n_tokens", "start_offset", "bin_id")
  }
}
