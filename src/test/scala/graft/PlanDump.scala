package graft
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = SparkFixture.spark
    val sf = "/root/testdata/sf0.1"
    val picks = Seq(
      "q_scan_filter_project" -> "Filter + projection pushed into the parquet scan (PushedFilters, pruned ReadSchema).",
      "q_join_broadcast_lookup" -> "The reference's lookup join: dimension broadcast, fact side never shuffles.",
      "q_join_shuffle_inner" -> "Fact-fact sort-merge join: both sides exchange on the key (the 100 TB-safe shape).",
      "q_join_asof" -> "As-of join as tagged-union merge: ONE hash exchange + window, no join blowup.",
      "q_agg_groupby_hash" -> "TPC-H Q1 shape: partial (map-side) + final hash aggregate.",
      "q_agg_skew_salted" -> "Salted two-phase aggregate: first shuffle on (key, salt), then tiny final shuffle.",
      "q_tpch_q5_shape" -> "6-way join: AQE picks one whole-stage-codegen span of broadcast joins at this scale; same code degrades to shuffle joins when sides outgrow the threshold.",
      "q_ext_cosine_topk_native" -> "Similarity scan through the native codegen FloatDot expression + TakeOrderedAndProject (no global sort).",
      "q_ext_cosine_ivf" -> "IVF ANN: map-side-combined argmax centroid assignment (partial max_by before the exchange), broadcast cell probe.",
      "q_ext_stratified_sample" -> "Hash-based sampling is map-only: the md5 filter evaluates inside the scan stage; the only exchange is the presentation sort.",
      "q_ext_seq_packing" -> "Sequence packing: TWO-PASS prefix sum — the corpus-sized window is hash-partitioned by shard (parallel); only the tiny per-shard-totals window single-partitions; offsets broadcast back.",
      "q_ext_minhash_neardup" -> "MinHash near-dup: 16 minhashes in one aggregation pass, then candidate pairs via a SELF-JOIN on (band, sig) — no collect_list, no giant bucket rows; all three (band,sig) shuffles share one partitioning.",
      "q_ext_bm25" -> "BM25: tf/df/dl computed scan-side (filter HOFs, no explode); ONE global 1-row stats aggregate broadcast back to the corpus scan.",
      "q_ext_contamination" -> "Decontamination: benchmark 3-gram set joins the corpus gram stream on the gram key — linear shuffle join that AQE converts to broadcast when the benchmark side is small.",
      "q_win_topk_agg_native" -> "Bounded top-k TypedImperativeAggregate: partial_topkpairs combines the O(k) heap map-side; only k pairs per group cross the shuffle (vs the window variant's full partition sort).",
      "q_source_partitioned_pruning" -> "Hive-partitioned scan: the event_type filter resolves to PartitionFilters — whole directories pruned at planning time.",
      "q_source_v2_pk_read" -> "PK merge-on-read through the V2 catalog: one input partition per hash bucket, last-writer-wins resolved inside the readers (streaming k-way merge over key-sorted runs, O(open files) memory) — zero exchanges below the presentation sort.",
      "q_ext_sessionize" -> "Batch sessionization: lag window, cumsum window and the session aggregate all share ONE hashpartitioning(user_id) exchange.",
      "q_ext_anomaly_zscore" -> "Anomaly detection: long-cents moments partial-aggregate map-side; the |event_type|-bounded stats frame broadcasts back; the 2.5σ cut evaluates inside the broadcast join.",
      "q_ext_minhash_jaccard" -> "Oracled MinHash: one explode feeds 8 min-aggregates (no seed×shingle blowup); candidates come from per-band signature self-joins; the true-Jaccard intersection join is candidate-bounded.",
      "q_ext_zipf" -> "Zipf head: the corpus-sized work is one word groupBy; the unpartitioned rank/cumsum window runs AFTER TakeOrdered(limit=50), so it never sees the vocabulary.",
      "q_tpch_q1_shape" -> "The full Q1 pricing summary: one scan, 8 aggregates (long-cents + decimal-product sums) partial-combined map-side into 4 groups.",
      "q_tpch_q6_shape" -> "Q6: all three range predicates in PushedFilters (row-group pruning does the work), then a single global exact sum.",
      "q_ext_length_deciles" -> "Per-language deciles: rank and per-language count share ONE lang exchange (the unordered count window reuses the rank sort); the 9-row decile grid broadcasts.",
      "q_ext_pagerank" -> "PageRank: each of the 5 iterations is ONE shuffle join (outdeg pre-folded onto the edge relation) + a map-side-combined integer sum; localCheckpoint truncates lineage so the shown plan is the final flat round, not 5 nested rounds.",
      "q_ext_edit_distance" -> "Levenshtein verify over banded-MinHash candidates: pair space proportional to true duplicate structure (LSH buckets), (lang, |len| ≤ k) kept as sound residual filters; the 120-char prefix bounds per-pair cost.",
      "q_ext_embed_center" -> "Corpus mean-centering: 64 exact nano sums partial-combine map-side into ONE 1-row frame that broadcasts back; the distance pass is map-only over the scan.",
      "q_ext_null_profile" -> "Column profiling: a single scan feeds one 25-expression aggregate (Expand ×6 for the exact count-distincts — the documented scale knob), stacked to rows afterwards.",
      "q_ext_time_weighted" -> "Time-weighted average: the lead window and the per-user aggregate share ONE hashpartitioning(user_id) exchange; products sum as longs map-side.",
      "q_ext_kmeans" -> "K-means step: both assignment passes are broadcast-K map-side argmax (partial max_by before any exchange); the centroid update is one groupBy(cid) whose 64 nano sums combine map-side.",
      "q_ext_pack_concat" -> "Packed-sequence materialization: the bin-keyed body shuffle is capacity-bounded (4096 tokens + one overflow doc per group), so the collect_list can never grow with the corpus.",
      "q_ext_incremental_dedup" -> "Incremental ingestion dedup: in-batch winner via an md5-keyed window, then a hash-only left join against the snapshot's distinct-hash relation — document bodies never shuffle.",
      "q_source_schema_merge" -> "Schema-evolution read: mergeSchema unifies two different-column slices at planning time; each file scan reads only the columns its footer has.",
      "q_ext_semdedup" -> "SemDeDup: broadcast-argmax cluster assignment, then a cid-keyed equi self-join for intra-cluster pairs only — K is the knob that keeps per-cluster pair work bounded; cosine runs through the codegen'd floatdot.",
      "q_ext_boilerplate" -> "Corpus boilerplate: distinct shingles and their document frequency are two md5-digest-keyed hash aggregates sharing the gh partitioning — linear end to end, no pair space.",
      "q_ext_power_iter" -> "Power iteration: each Gram-free round is a 1-row direction broadcast + ONE map-side-combined 64-long-sum aggregate — the covariance matrix never exists.",
      "q_ext_pq_encode" -> "Product quantization: the 16-row codebook broadcasts; 8 subspace distances evaluate in the scan stage; the vec_id groupBy's struct-min argmins combine map-side.",
      "q_ext_ivfpq_search" -> "IVF-PQ search: cell probe, codebook, ADC table and query vector ALL broadcast; candidates rank from codes alone; both top-k stages are TakeOrderedAndProject — nothing corpus-sized shuffles.",
      "q_ext_cms_heavy_hitters" -> "Count-Min sketch: partial_cmssketch combines the constant 4×64-cell state map-side (ObjectHashAggregate) — 2 KB per partition crosses the shuffle, never the vocabulary; estimates read from the broadcast 1-row sketch.",
      "q_ext_sq8_encode" -> "SQ8 encode: the 128-expression min/max stats pass partial-combines into ONE row that broadcasts back; encoding is map-only inside the scan stage.",
      "q_ext_sq8_search" -> "SQ8 asymmetric search: one fused interpreted fold per row against the broadcast stats+query, TakeOrderedAndProject shortlist, 20-row exact rerank — nothing corpus-sized shuffles.",
      "q_join_range_binned" -> "Keyless range join, binned: intervals explode to ≤2 bins, points map to ONE — a plain equi shuffle join on the bin id with the range residual, where the naive plan is a BroadcastNestedLoopJoin.",
      "q_join_lateral" -> "Correlated LATERAL with ORDER BY+LIMIT: Catalyst decorrelates to a rank window over one equi-join — orders is scanned once, never per-customer.",
      "q_ext_embed_pool" -> "Grouped embedding pooling: 65 agg expressions (count + 64 nano sums) combine map-side into one source-keyed exchange; no embedding array is ever a shuffle key.",
      "q_ext_scd2_enrich" -> "SCD2 enrichment: the version build is one o_custkey window; the join is an equi-hash on the user key with the validity interval as residual — ≤1 match per event, no pair blowup.",
      "q_join_not_in" -> "NOT IN subquery: planned as the null-aware broadcast anti join (BroadcastHashJoin LeftAnti BuildRight with the isNullAwareAntiJoin flag) — three-valued logic forces a broadcastable set; rewrite to NOT EXISTS once the set outgrows broadcast.",
      "q_ext_paragraph_dedup" -> "Sub-document dedup: the first-occurrence race is one md5(segment)-keyed aggregate joined back semi — digests and (doc_id, ord) pairs shuffle, bodies only move in the doc_id-keyed reassembly.",
      "q_join_dpp" -> "Dynamic partition pruning: the dim side's broadcast result re-enters the fact scan as a dynamicpruning PartitionFilter — whole directories skipped at EXECUTION time, where static pushdown sees nothing to prune.",
      "q_join_bloom_runtime" -> "Runtime bloom filter: InjectRuntimeFilter plants a might_contain probe on the fact scan from the selective side's keys — row-level pruning BEFORE the shuffle feeding the sort-merge join.",
      "q_ext_weighted_sample" -> "A-ES weighted sampling: the u^(1/w) rank key evaluates scan-side; one lang-keyed exchange feeds the per-stratum row_number window; only the k winners survive.",
      "q_ext_global_shuffle" -> "Global training shuffle: the corpus-sized rank window hash-partitions by the hash byte (256 shards); the 256-row offsets relation broadcasts back; the only corpus-wide exchange is the final range sort — the permutation itself.",
      "q_ext_dup_spans_robust" -> "Alignment-robust span dedup: every-position 40-gram digests drop to the 1/8 mod sample INSIDE the scan stage (map-side filter before the digest exchange); the cross-doc test is a partial-combined two-level aggregate.",
      "q_ext_dedup_rewrite" -> "Span-cut rewrite: doc-keyed island collect (window-count-bounded arrays), then ONE codegen'd aggregate-HOF fold of each island array over its doc's string — digest- and doc-keyed joins only, no pair space, no per-char explosion.",
      "q_source_v2_pushdown" -> "DataSourceV2 connector: the GraftScan leaf shows files=kept/total (footer-stats skipping) and PushedFilters; the surviving files decode through the VECTORIZED columnar path (ColumnarToRow above the scan) with the pushed predicates pruning parquet row groups/pages — filters stay residual, so Spark's Filter re-applies exact truth above the 4-column batch decode.",
      "q_sql_recursive_cte" -> "Native WITH RECURSIVE: the engine drives the fixpoint — each recursion step is one shuffle join of the SHRINKING frontier against the id relation, the union accumulates lazily, and the final groupBy partial-combines map-side.",
      "q_agg_approx_top_k" -> "approx_top_k: constant-size sketch state partial-combines map-side (one ObjectHashAggregate row crosses the shuffle, never the key space); exact in this regime because capacity exceeds the distinct count.",
      "q_ext_dedup_e2e" -> "End-to-end dedup: banded candidates (self-joins, never all-pairs) feed the CC fixpoint — the shown plan is the FINAL flat round (lineage-truncated) + the label roll-up; per round one edge-label shuffle + min-groupBy + pointer-jump self-join.",
      "q_source_v2_agg_pushdown" -> "V2 aggregate pushdown: COUNT/MIN/MAX collapsed into GraftAggregateScan (PushedAggregates) — the answer is one precomputed row from manifest rowCounts + typed footer stats; NO aggregate exec, zero data bytes read (temporal MIN/MAX — the freshness check — answers the same way from ISO-rendered stats).",
      "q_source_v2_date_pushdown" -> "Temporal pushdown: a timestamp_ntz range over year-batched commits — the scan leaf's files=kept/total shows the ISO-stat file skip (1-2 of 7 kept), the pushed predicate prunes row groups inside the survivors, and the decode is columnar (ColumnarToRow above the scan). The dominant 100 TB shape: 'last month' over a commit-ordered table.",
      "q_join_spj" -> "Storage-partitioned join: both bucketed scans report KeyGroupedPartitioning(bucket(8, key)) and the MERGE hint pins the SMJ — ZERO hash exchanges in the whole plan: the join consumes the bucket layout and the per-key aggregation above reuses it (group key = join key); the only exchange is the final ORDER BY's range partition.",
      "q_source_v2_pk_partial" -> "partial-update merge-on-read: the same per-bucket BatchScan shape as q_source_v2_pk_read, with per-FIELD last-non-null folds inside the readers (persisted fseq provenance structs) — the merge engine changes the reader, never the plan.",
      "q_source_v2_incremental" -> "Batch incremental read: the (a,b] interval as a per-bucket BatchScan — here the state-diff fallback (no producer on this table); with changelog-producer the same plan reads ONLY the interval's persisted changelog files. Column pruning reaches the readers (projected cols + never-emitted key region).",
      "q_source_v2_audit_log" -> "The $audit_log system table: the current resolved state as +I through the CDC catch-up plan — per-bucket engine readers, zero exchanges below the presentation sort, identical shape to the PK merge-on-read scan.",
      "q_source_v2_change_history" -> "The $changelog system table: the retained change history — snapshot 0 resolves per bucket, every later produced commit is a PASS-THROUGH partition over its persisted changelog files (one partition per file, no resolve, no netting).",
      "q_source_v2_ts_pushdown" -> "ZONED-timestamp pushdown: a TIMESTAMP range over week-batched commits — graft writes INT64 TIMESTAMP_MICROS (never INT96), so the '+0000'-rendered manifest stats skip files (1-2 of 5 kept), the pushed predicate prunes row groups, the decode is columnar. The reference's own TIMESTAMP(3) event_time, served like any other stat.",
      "q_source_v2_group_agg" -> "GROUPED aggregate pushdown: GROUP BY event_type collapsed into GraftAggregateScan — every file is provably single-valued in the group column (manifest null counts + min=max), so the per-type census is precomputed rows from metadata; NO aggregate exec, zero data bytes read.",
      "q_source_v2_dv_update" -> "Delta-based (merge-on-read) UPDATE read-back: the scan STAYS columnar — dv'd partitions decode through GraftDvVectorReader (batch-level position suppression, untouched batches zero-copy), clean files and the appended level-1 images keep the plain vectorized reader. The write itself cost ∝ matches, zero rewrites.",
      "q_source_v2_dv_merge" -> "Delta-based MERGE read-back: same shape — deletion-vectored files decode columnar with batch-level suppression, appended insert/update images scan normally; nothing in the plan or the decode is proportional to the table's untouched bytes.",
      "q_source_v2_pk_update" -> "PK-table SQL UPDATE read-back: the same per-bucket merge-on-read BatchScan as q_source_v2_pk_read — the update re-appended images into the LWW stream, so the read plan is unchanged; no vectors, no rewrites, and the DML streamed as level-0 changes.",
      "q_source_v2_partitioned" -> "PARTITIONED BY pruning: a partition-key equality prunes EXACTLY (files=k/N in the scan leaf) because every batch-written file is single-valued in the key — manifest-stats skipping, no directory parsing; the surviving files decode columnar.",
      "q_source_v2_ctas" -> "Atomic CTAS result read: the published table scans exactly like any catalog table (manifest-planned files, columnar decode) — the CTAS itself staged in a hidden dir and published with one rename, so no plan ever observed a half-table.",
      "q_source_v2_dec_pushdown" -> "DECIMAL pushdown: a money-range predicate over price-banded commits — scaled manifest stats ('249.9') skip files via exact unscaled-long comparison (1 of 4 kept), the pushed predicate prunes row groups as unscaled INT32s, the decode is columnar. The reference's own DECIMAL(5,1) measurement column, served like any other stat.",
      "q_stream_v2_part_sink" -> "Partitioned streaming sink read-back: the sink's task writers split files per partition value, so the streamed table's partition predicate prunes file-exactly (files=k/N in the scan leaf) and decodes columnar — the continuous date-partitioned ingest path with zero post-hoc clustering debt.",
      "q_source_v2_part_overwrite_dyn" -> "Dynamic partition overwrite read-back: the staged rows defined the replaced partitions (native distributed BatchWrite, one atomic commit), untouched partitions' files survived byte-identical — the read plans exactly like any partitioned scan; nothing in the plan betrays the two-partition backfill that produced it.",
      "q_source_v2_partitions_meta" -> "The $partitions system table: the per-partition census folded from manifest stats alone (zero data bytes at any table size), DISTRIBUTED like $files — executors fold their manifest slices into per-file census rows and one map-side-combined aggregation returns |partitions| rows; labels are injective (NULL renders __GRAFT_NULL__).",
      "q_source_v2_part_expire" -> "Partition expiry read-back: two dead-past partitions aged out as ONE metadata-only dropFiles commit (values-time strategy over the rendered single-valued stats; zero data bytes moved), so the surviving table scans like any partitioned table — the plan shows only the in-window partition's files.",
      "q_source_v2_dyn_bucket" -> "Dynamic bucket mode read-back: the table grew its power-of-two bucket count through split commits (extendible hashing, count versioned in the snapshot — no writer-side key index), and the scan is the SAME per-bucket merge-on-read BatchScan as any fixed PK table, one input partition per grown bucket, zero exchanges below the presentation sort; a key-equality lookup prunes to buckets=1 under the scanned generation's count.")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries (sf0.1, local[4], AQE on)\n\n")
    sb.append("Generated by `graft.PlanDump` (Test scope). Each plan is the EXECUTED plan\n")
    sb.append("(collected first so AQE finalizes), `explain formatted` style.\n")
    for ((name, note) <- picks) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.replaceAll("#\\d+[L]?", "")).take(40).mkString("\n").take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("WROTE PLANS.md")
  }
}
