package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Scale-up smoke (Test scope, run on demand): replicate the sf0.1 tables 10×
  * with per-replica key offsets (joins stay consistent inside each replica,
  * so every query's semantics — and result cardinality — scale ~10×), then
  * time headline queries at 1× and 10× and report the runtime ratio. A
  * shuffle-sane plan scales ~linearly; a plan hiding a broadcast-of-fact or
  * quadratic step blows past 10×. Results land in SCALE.md.
  */
object ScaleSmoke {
  private val Big = 1000000000L // replica key offset, far above any real key

  def main(a: Array[String]): Unit = {
    val spark = SparkFixture.spark
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf1x"
    val replicas = 10

    // the marker is VERSIONED: a recipe change (e.g. embeddings joining the
    // replicated set) must bust any stale cache left by an earlier build,
    // which would otherwise silently time "10x" against 1x-sized tables
    if (!Files.exists(Paths.get(s"$dst/_done_v2"))) {
      Files.createDirectories(Paths.get(dst))
      // key-ish columns per table: offset by replica * Big
      val keyCols = Map(
        "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
        "orders"   -> Seq("o_orderkey", "o_custkey"),
        "customer" -> Seq("c_custkey"),
        "part"     -> Seq("p_partkey"),
        "supplier" -> Seq("s_suppkey"),
        "events"   -> Seq("event_id", "user_id"),
        "documents" -> Seq("doc_id"),
        // replica 0 keeps vec_ids < Big, so fixed-id contracts (the vec_id=0
        // query, semdedup's planted <25 originals) stay well-defined while
        // the corpus the scans/joins/aggs walk grows 10×
        "embeddings" -> Seq("vec_id"))
      for ((t, keys) <- keyCols) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val rep = (0 until replicas).map { i =>
          keys.foldLeft(base) { (df, k) => df.withColumn(k, col(k) + lit(i * Big)) }
        }.reduce(_ unionByName _)
        rep.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      // small dims unreplicated (nation/region join keys are not offset)
      for (t <- Seq("nation", "region"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      Files.write(Paths.get(s"$dst/_done_v2"), Array.emptyByteArray)
    }

    val picks = Seq(
      "q_agg_groupby_hash",    // TPC-H Q1 shape: partial+final hash agg
      "q_join_shuffle_inner",  // fact-fact sort-merge join
      "q_join_broadcast_lookup", // dim broadcast: fact side map-only
      "q_limit_topk",          // TakeOrderedAndProject (no global sort)
      "q_ext_exact_dedup",     // hash-partitioned dedup over md5(text)
      "q_win_rank",            // window over hash exchange
      "q_ext_stratified_sample", // map-only hash sampling
      // round-3 rewrites: each replaced a named scale-killer — the ratio
      // column is the empirical check that the replacement scales
      "q_agg_corr_exact",      // sharded long-cents power sums
      "q_ext_minhash_neardup", // banded self-join pair-gen (no collect_list)
      "q_ext_seq_packing",     // two-pass prefix sum (no global window)
      "q_ext_dedup_clusters",  // iterative CC: per-round join + min-groupBy
      "q_ext_bm25",            // scan-side tf/df + broadcast stats row
      "q_ext_contamination",   // explode + broadcast gram join
      // round-4 additions: the new family's scale-sensitive shapes
      "q_ext_sessionize",      // ONE user_id shuffle shared by windows + agg
      "q_ext_tfidf",           // (doc,word)/word-keyed shuffles, vocab df join
      "q_ext_minhash_jaccard", // band-signature self-join candidates
      "q_ext_anomaly_zscore",  // cents-moment groupBy + broadcast stats
      "q_ext_cohort_retention", // user-keyed aggs, date-bounded matrix
      "q_ext_unigram_logprob", // single explode + vocab join + long sums
      "q_ext_doc_chunks",      // map-only explode chunking
      // round-4 continuation: link analysis + profiling + step integral
      "q_ext_pagerank",        // 5 × (edge join + agg), lineage-truncated
      "q_ext_edit_distance",   // LSH-banded verify pairs (dup-degenerate caveat above)
      "q_ext_time_weighted",   // user-keyed lead window + exact long agg
      "q_ext_null_profile",    // one-pass 25-expr agg (6× Expand)
      "q_ext_boilerplate",     // linear digest-keyed df aggs (no pair space)
      "q_ext_semdedup",        // broadcast-argmax + cid-keyed pair join
      "q_ext_power_iter",      // 2 × (1-row broadcast + 64-long-sum agg)
      "q_ext_pq_encode",       // broadcast codebook + map-side struct-mins
      "q_ext_ivfpq_search",    // cell probe + code ranking + bounded rerank
      // round-5 additions
      "q_ext_sq8_encode",      // 1-row stats broadcast + map-only encode
      "q_ext_sq8_search",      // fused fold + TakeOrdered + bounded rerank
      "q_ext_cms_heavy_hitters", // constant-state sketch, map-side combined
      "q_ext_bpe_merge",       // word-keyed agg, vocab-sized pair stage
      "q_join_range_binned",   // bin-keyed equi join (keyless range join)
      // round-7 additions
      "q_ext_global_shuffle",  // sharded rank + broadcast offsets, one range sort
      "q_ext_dup_spans",       // digest-keyed two-level agg (no pair space)
      "q_ext_dup_spans_robust", // 8x window stream, map-side 1/8 mod sample
      "q_ext_scd2_enrich",     // custkey window + interval-residual join
      "q_ext_embed_pool",      // 65-expr nano-sum groupBy
      "q_ext_data_card",       // one grouped pass + md5 dedup window
      // round-6 SQL-surface additions (each should scale as its family)
      "q_set_except_all",      // signed-count aggregate (one shuffle)
      "q_join_not_in",         // null-aware BROADCAST anti join
      "q_agg_string_agg",      // filtered groups: payload stays bounded
      "q_ext_paragraph_dedup", // digest-keyed first-occurrence, no pair space
      // round-6 scan-pruning runtime trio + weighted sampling
      "q_join_bloom_runtime",  // bloom probe prunes fact rows pre-shuffle
      "q_join_dpp",            // dim broadcast prunes fact PARTITIONS
      "q_ext_weighted_sample", // per-stratum A-ES window, one lang shuffle
      // round-8 additions: Spark-native surfaces + the V2 connector
      "q_sql_recursive_cte",   // per-round frontier join, frontier shrinks
      "q_agg_approx_top_k",    // constant sketch state, map-side combined
      "q_source_v2_pushdown",  // manifest-planned scan + stats skipping
      // round-9 additions: the V2 pushdown suite
      "q_source_v2_agg_pushdown", // metadata-only COUNT/MIN/MAX (zero data read)
      "q_join_spj",            // co-bucketed join: write-time shuffle, not per-query
      // round-13 additions: the batch change surfaces (staged PK history
      // scales with customer; staging itself amortizes under min-of-2)
      "q_source_v2_pk_read",   // per-bucket sorted-run merge-on-read
      "q_source_v2_incremental", // interval state-diff per bucket, batch
      "q_source_v2_change_history", // pass-through of persisted changelog files
      // round-14 addition: catch-up CDC plan (per-bucket live resolve, +I)
      "q_source_v2_audit_log",
      // round-15 addition: temporal file skip + columnar filtered decode
      "q_source_v2_date_pushdown",
      // round-16 additions: zoned-ts skip + grouped metadata census
      "q_source_v2_ts_pushdown",
      "q_source_v2_group_agg",
      // round-17 additions: merge-on-read DML read-back (DV suppression +
      // level-1 images; the write cost ∝ matches is pinned in DeltaDmlSpec)
      // and exact partition pruning over a PARTITIONED BY table
      "q_source_v2_dv_update",
      "q_source_v2_partitioned",
      // round-18 addition: money-column range scan (decimal stats skip +
      // unscaled-int row-group pruning + vectorized decode)
      "q_source_v2_dec_pushdown",
      // round-19 addition: metadata-only partition expiry (drop commit +
      // values-time proofs; the read-back scans only the surviving slice)
      "q_source_v2_part_expire",
      // round-20 addition: dynamic bucket mode — the read scans the GROWN
      // power-of-two layout (per-bucket merge, count from the snapshot)
      "q_source_v2_dyn_bucket")

    // min-of-2 like Bench: the first execution pays codegen compilation and
    // plan warmup (dominant at 1× scale — an iterative query's ~12 rounds of
    // fresh plans cost more than its data), which would otherwise make the
    // 10×/1× ratio meaninglessly < 1
    def time(name: String, dir: String): Double =
      Seq.fill(2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write
          .mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // warmup both dirs
    spark.read.parquet(s"$src/lineitem.parquet").groupBy("l_returnflag").count().collect()
    spark.read.parquet(s"$dst/lineitem.parquet").groupBy("l_returnflag").count().collect()

    val sb = new StringBuilder
    sb.append("# SCALE — 10× scale-up smoke (sf0.1 → 10 replicas, key-offset)\n\n")
    sb.append("Generated by `graft.ScaleSmoke` (Test scope). Per-replica key offsets\n")
    sb.append("keep joins consistent, so results (and work) scale ~10×. A shuffle-sane\n")
    sb.append("plan shows a runtime ratio near the data ratio; super-linear blowup\n")
    sb.append(s"would expose a broadcast-of-fact or quadratic step. local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}], noop sink.\n\n")
    sb.append("Caveat: replication copies every document TEXT verbatim, so the 10×\n")
    sb.append("corpus is dup-degenerate — each doc gains 10 exact copies. Pairwise\n")
    sb.append("ops (q_ext_minhash_jaccard, q_ext_edit_distance) therefore see their\n")
    sb.append("blocks/buckets grow ~11× and their PAIR OUTPUT grow ~replicas²\n")
    sb.append("(≈100×, not 10×) per dup group, so a large ratio on those rows\n")
    sb.append("reflects legitimately grown output, not a plan defect; real corpora\n")
    sb.append("bound dup-group size upstream (exact dedup runs first in any\n")
    sb.append("pipeline, and the neardup family caps per-bucket pairs).\n")
    sb.append("q_ext_semdedup runs here with K FROZEN at 8 clusters, so its\n")
    sb.append("intra-cluster pair work grows (10N/K)²/(N/K)² = 100× by design —\n")
    sb.append("the op's contract (and SemDeDup's own deployment) scales K ∝ N to\n")
    sb.append("keep per-cluster pairs constant; the ratio row documents what\n")
    sb.append("happens when the knob is NOT turned, not a plan defect.\n")
    sb.append("q_join_range_binned joins on TIME ALONE, and replication does not\n")
    sb.append("offset timestamps — all 10 replicas' signup windows overlap the same\n")
    sb.append("30 days, so each point matches ~10× the windows and the matched-pair\n")
    sb.append("stream grows ~100×; its ratio row measures that legitimately larger\n")
    sb.append("join output (a real corpus 10× larger in TIME keeps per-point match\n")
    sb.append("counts constant and would scale ~10×).\n\n")
    sb.append("| query | 1× sec | 10× sec | ratio |\n|---|---|---|---|\n")
    for (q <- picks) {
      val t1 = time(q, src); val t2 = time(q, dst)
      sb.append(f"| $q | $t1%.2f | $t2%.2f | ${t2 / t1}%.1f× |\n")
      println(f"$q%-28s 1x=$t1%6.2fs 10x=$t2%6.2fs ratio=${t2 / t1}%5.1f")
    }
    Files.writeString(Paths.get("/root/repo/SCALE.md"), sb.toString)
    println("WROTE SCALE.md")
  }
}
