package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY.md §4): the optimizations we claim Catalyst
  * gives us must actually appear in the physical plan — broadcast for dim
  * joins, sort-merge for fact-fact, filter pushdown + column pruning at the
  * parquet scan, whole-stage codegen on the hot paths.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkFixture.sf)
      .queryExecution.executedPlan.toString

  test("q_join_broadcast_lookup uses a broadcast hash join") {
    assert(plan("q_join_broadcast_lookup").contains("BroadcastHashJoin"))
  }

  test("q_join_shuffle_inner uses sort-merge join (fact-fact, 100TB-safe)") {
    assert(plan("q_join_shuffle_inner").contains("SortMergeJoin"))
  }

  test("q_scan_filter_project pushes the filter into the parquet scan") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"), p.take(2000))
    // column pruning: the scan must not read all 11 lineitem columns
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"))
  }

  test("q_agg_groupby_hash runs as hash aggregate with partial (map-side) agg") {
    val p = plan("q_agg_groupby_hash")
    assert(p.contains("HashAggregate"))
    assert(p.toLowerCase.contains("partial_"), "no partial aggregation found")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // AQE only shows the final (codegen'd) plan after execution;
    // codegen'd spans print as "*(n) Operator"
    val df = SparkEntry.queries("q_scan_filter_project")(spark, SparkFixture.sf)
    df.collect() // materialize THIS plan so AQE finalizes it
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("q_ext_cosine_topk broadcasts only the query vector") {
    val p = plan("q_ext_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("q_source_partitioned_pruning prunes partitions at planning time") {
    val p = plan("q_source_partitioned_pruning")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(2000))
    // the pruned scan must not also carry event_type as a data filter
    assert(p.contains("event_type = click)") || p.contains("event_type#"), p.take(2000))
  }

  test("q_win_topk_agg_native combines the top-k heap map-side (no full sort)") {
    val p = plan("q_win_topk_agg_native")
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.toLowerCase.contains("partial_topkpairs"),
      "top-k heap must combine map-side before the shuffle: " + p.take(2000))
    // the pre-shuffle plan must NOT sort rows (that's the window variant's cost)
    val beforeExchange = p.substring(p.indexOf("Exchange hashpartitioning"))
    assert(!beforeExchange.contains("WindowExec"), p.take(2000))
  }

  test("q_join_bucketed_colocated joins without shuffling either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_join_bucketed_colocated")
      assert(p.contains("SortMergeJoin"), p.take(2000))
      // bucket layout replaces the shuffle: the only Exchange is the output sort
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"join sides shuffled: $exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_ext_minhash_neardup generates pairs with a self-join, never collect_list") {
    val p = plan("q_ext_minhash_neardup")
    // the old pair-gen collected every bucket member into ONE row's array —
    // a degenerate bucket (mass-duplicated doc) became a giant single row
    assert(!p.contains("collect_list"), p.take(2000))
    assert(p.contains("Join"), "candidate pairs must come from a join")
  }

  test("q_ext_seq_packing cumsum windows are partitioned, not a global orderBy") {
    val p = plan("q_ext_seq_packing")
    // pass 1 (the corpus-sized window) must hash-partition by shard; only
    // the per-shard-TOTALS window (thousands of rows) may single-partition
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
  }

  test("q_ext_global_shuffle ranks per shard; only the 256-row offsets window is global") {
    val p = plan("q_ext_global_shuffle")
    // the corpus-sized rank window must hash-partition by the hash-byte
    // shard; the offsets relation must reach the join as a broadcast
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      p.take(3000))
  }

  test("q_ext_dup_spans joins on the window digest, never a pair space") {
    val p = plan("q_ext_dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the cross-doc test is a two-level aggregation with a map-side partial
    assert(p.toLowerCase.contains("partial_"), p.take(3000))
  }

  test("q_ext_dup_spans_robust samples map-side before the digest shuffle") {
    val p = plan("q_ext_dup_spans_robust")
    // the 1/8 mod filter must sit under the generate, not after an Exchange:
    // no Exchange may appear between Generate and the first Filter — cheap
    // proxy: the plan joins on the digest and never a pair space
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.toLowerCase.contains("partial_"), p.take(3000))
  }

  test("q_ext_dup_coverage island window partitions by doc_id (no global window)") {
    val p = plan("q_ext_dup_coverage")
    assert(p.contains("hashpartitioning(doc_id"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("q_join_skew_salted spreads the hot key over the salt space") {
    val df = SparkEntry.queries("q_join_skew_salted")(spark, SparkFixture.sf)
    val p = df.queryExecution.executedPlan.toString
    // join key must be the composite (skew_key, salt), not skew_key alone
    assert(p.contains("skew_key") && p.contains("salt"), p.take(2000))
  }

  test("q_ext_anomaly_zscore broadcasts the per-type stats, combines moments map-side") {
    val p = plan("q_ext_anomaly_zscore")
    // the |event_type|-bounded stats frame must broadcast back to the scan …
    assert(p.contains("BroadcastExchange"), p.take(2000))
    // … and the cents/cents² moments must partial-aggregate before the shuffle
    assert(p.toLowerCase.contains("partial_sum"), "no map-side moment combine")
  }

  test("q_ext_zipf's global window runs after the distributed top-k, never the corpus") {
    val df = SparkEntry.queries("q_ext_zipf")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the unpartitioned rank/cumsum window is fed by TakeOrdered(limit=50)
    assert(p.contains("TakeOrderedAndProject(limit=50"), p.take(3000))
  }

  test("q_ext_importance_sample is map-only (no exchange except the output sort)") {
    val df = SparkEntry.queries("q_ext_importance_sample")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // match EVERY Exchange flavor (hash/range/SinglePartition/…)
    val exchanges = "Exchange \\S+".r.findAllIn(p).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"weighted sampling must not shuffle data: $exchanges")
  }

  test("q_ext_unigram_logprob explodes the corpus exactly once") {
    val df = SparkEntry.queries("q_ext_unigram_logprob")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val initialSplit = p.indexOf("== Initial Plan ==")
    val finalPlan = if (initialSplit >= 0) p.substring(0, initialSplit) else p
    // one Generate (explode) node: freq, total and the per-doc sums all
    // derive from the single per-(doc,word) count frame
    val generates = "Generate explode".r.findAllIn(finalPlan).toList
    assert(generates.length == 1, s"expected one explode: ${generates.length}")
  }

  test("q_ext_doc_chunks shuffles nothing but the presentation sort") {
    val df = SparkEntry.queries("q_ext_doc_chunks")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // match EVERY Exchange flavor (hash/range/SinglePartition/…)
    val exchanges = "Exchange \\S+".r.findAllIn(p).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"chunking must be map-only: $exchanges")
  }

  test("q_ext_sessionize shares ONE user_id shuffle across windows and the aggregate") {
    val df = SparkEntry.queries("q_ext_sessionize")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both lag/cumsum windows and the session groupBy reuse the same
    // hashpartitioning(user_id) — exactly one hash exchange in the plan
    val initialSplit = p.indexOf("== Initial Plan ==")
    val finalPlan = if (initialSplit >= 0) p.substring(0, initialSplit) else p
    val hashesFinal = "Exchange hashpartitioning\\(user_id".r.findAllIn(finalPlan).toList
    assert(hashesFinal.length == 1, s"expected one user_id exchange: $hashesFinal")
  }

  test("q_tpch_q6_shape pushes all three range predicates into the scan") {
    val p = plan("q_tpch_q6_shape")
    // shipdate window, discount band and quantity cap must all reach the
    // parquet reader — at 100 TB the row-group pruning IS the query
    assert(p.contains("PushedFilters"), p.take(2000))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity")) {
      val pushed = p.substring(p.indexOf("PushedFilters"))
      assert(pushed.take(400).contains(c), s"$c not pushed: ${pushed.take(400)}")
    }
    // column pruning: only the 4 referenced columns are read
    assert(!p.contains("l_comment") && !p.contains("l_orderkey"))
  }

  test("q_ext_length_deciles: one corpus scan, one lang exchange, broadcast grid") {
    val df = SparkEntry.queries("q_ext_length_deciles")(spark, SparkFixture.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val initialSplit = p.indexOf("== Initial Plan ==")
    val finalPlan = if (initialSplit >= 0) p.substring(0, initialSplit) else p
    // rn and the per-lang count come from the same window pass: documents
    // is scanned once, and the only hash exchange is hashpartitioning(lang)
    val scans = "Scan parquet".r.findAllIn(finalPlan).toList
    assert(scans.length == 1, s"expected one documents scan: ${scans.length}")
    val hashes = "Exchange hashpartitioning\\(\\S+".r.findAllIn(finalPlan).toList
    assert(hashes.length == 1 && hashes.head.contains("lang"),
      s"expected exactly one lang exchange: $hashes")
    // the 9-row decile grid broadcasts; the corpus side never re-shuffles
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastNestedLoopJoin"), finalPlan.take(2000))
  }

  test("q_tpch_q4_shape runs EXISTS as a semi join, never a row-widening join") {
    val p = plan("q_tpch_q4_shape")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q_tpch_q22_shape runs NOT EXISTS as an anti join with broadcast scalar") {
    val p = plan("q_tpch_q22_shape")
    assert(p.contains("LeftAnti"), p.take(2000))
    // the positive-balance average is ONE broadcast row, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }

  test("q_tpch_q19_shape's implied conjuncts prune both scans before the join") {
    val p = plan("q_tpch_q19_shape")
    // the OR itself can't push down; its derived prefilters must: brand
    // IN-list on the part scan, quantity range on the lineitem scan
    val scans = p.split("Scan parquet").drop(1)
    assert(scans.exists(s => s.take(600).contains("p_brand")),
      "brand IN-list not pushed to the part scan: " + p.take(3000))
    assert(scans.exists(s => s.take(600).contains("l_quantity")),
      "quantity range not pushed to the lineitem scan: " + p.take(3000))
  }

  test("q_tpch_q2_shape decorrelates the scalar max via agg+join, not a window") {
    val p = plan("q_tpch_q2_shape")
    assert(!p.contains("WindowExec"), p.take(2000))
    assert(p.toLowerCase.contains("partial_max"),
      "per-part max must combine map-side: " + p.take(2000))
  }

  test("q_tpch_q15_shape broadcasts the one-row scalar max") {
    val p = plan("q_tpch_q15_shape")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    assert(!p.contains("WindowExec"), p.take(2000))
  }

  test("q_ext_edit_distance: LSH-banded equi pair-gen, then CPU-spread repartition") {
    val p = plan("q_ext_edit_distance")
    // candidate generation must stay equi-joins (band-signature self-join +
    // metadata joins) — a cartesian/BNL here would be the all-pairs plan
    // the LSH banding exists to prevent
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // the explicit pair-id repartition survives to the physical plan (the
    // distance loop's CPU is invisible to AQE's size-based coalescing)
    assert("Exchange hashpartitioning\\(id_a".r.findFirstIn(p).isDefined,
      "missing the CPU-spreading pair repartition: " + p.take(2000))
  }

  test("q_ext_embed_center: map-side-combined nano sums, centroid broadcast back") {
    val p = plan("q_ext_embed_center")
    assert(p.toLowerCase.contains("partial_sum"), p.take(2000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the 1-row centroid must broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_ext_kmeans: broadcast argmax assignment, no corpus-sized join") {
    val p = plan("q_ext_kmeans")
    assert(!p.contains("SortMergeJoin"),
      "assignment must be broadcast-K, never a shuffle join: " + p.take(2000))
    assert(p.toLowerCase.contains("partial_max_by") ||
      p.toLowerCase.contains("partial_finalmax"),
      "argmax must combine map-side: " + p.take(3000))
  }

  test("q_ext_power_iter: per-round 1-row broadcast, nano sums combine map-side") {
    val p = plan("q_ext_power_iter")
    // Gram-free rounds: the direction vector broadcasts (1 row), the 64
    // long sums partial-combine before any exchange, and nothing
    // corpus-sized ever joins through a shuffle
    assert(p.toLowerCase.contains("partial_sum"), p.take(2000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the direction vector must broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_ext_semdedup: codegen'd cosine in the pair stage, cid-keyed pairing") {
    val p = plan("q_ext_semdedup")
    // the K-row centroid side broadcasts (a Cross BNLJ over 8 rows is the
    // broadcast-argmax contract); the intra-cluster pair join must be a
    // cid-keyed equi-join — an unkeyed CartesianProduct would be the O(N²)
    // all-pairs plan the clustering exists to prevent
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert("hashpartitioning\\(cid".r.findFirstIn(p).isDefined ||
      "SortMergeJoin \\[cid".r.findFirstIn(p).isDefined,
      "intra-cluster pairing must key on cid: " + p.take(3000))
    assert(p.contains("floatdot"),
      "cosine must run through the codegen'd FloatDot: " + p.take(2000))
  }

  test("q_ext_pq_encode: broadcast codebook, struct-min combines map-side") {
    val p = plan("q_ext_pq_encode")
    // the 16-row codebook must broadcast (a shuffle join would move the
    // corpus); the 8 struct-min argmins partial-combine before the exchange
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.toLowerCase.contains("partial_min"),
      "argmin must combine map-side: " + p.take(3000))
  }

  test("q_ext_ivfpq_search: every stage broadcast-bounded, no corpus shuffle join") {
    val p = plan("q_ext_ivfpq_search")
    // cell probe, codebook, ADC table and query vector all broadcast; a
    // SortMergeJoin would mean something corpus-sized is shuffling
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k stages must be TakeOrdered, not global sorts: " + p.take(3000))
  }

  test("q_ext_boilerplate: linear digest-keyed aggs, no pair space anywhere") {
    val p = plan("q_ext_boilerplate")
    // both aggregations combine map-side on the 16-byte md5 digest; the
    // df join is shingle-keyed equi — no cartesian, no document bodies as
    // shuffle keys
    assert(p.toLowerCase.contains("partial_count") ||
      p.toLowerCase.contains("partial_sum"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert("Exchange hashpartitioning\\(gh".r.findFirstIn(p).isDefined,
      "shuffle key must be the md5 digest column: " + p.take(3000))
  }

  test("q_ext_cms_heavy_hitters: the sketch combines map-side as constant state") {
    val p = plan("q_ext_cms_heavy_hitters")
    assert(p.toLowerCase.contains("partial_cmssketch"),
      "CMS must run as a map-side-combined ObjectHashAggregate: " + p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }

  test("q_join_range_binned joins on the bin equi-key, never a nested loop") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "binning must turn the keyless range join into an equi join: " + p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q_join_lateral decorrelates to a window over one join (no per-row rescan)") {
    val p = plan("q_join_lateral")
    // Catalyst must rewrite the correlated ORDER BY + LIMIT lateral into a
    // rank-window over an equi-join — a per-customer re-scan of orders would
    // show up as a nested-loop / cartesian plan
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Window") || p.contains("partial_"),
      "expected the decorrelated window/aggregate plan: " + p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "expected an equi-join after decorrelation: " + p.take(2000))
  }

  test("q_ext_sq8_encode: one-pass stats row broadcasts back, encode is map-only") {
    val p = plan("q_ext_sq8_encode")
    // the 128-expression min/max pass must combine map-side; the encode side
    // must not shuffle the corpus (only the 1-row stats frame broadcasts).
    // (partial_max is elided from the printed plan — Spark truncates agg
    // lists at 25 entries — so partial_min stands for the whole pass.)
    assert(p.toLowerCase.contains("partial_min"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
  }

  test("q_join_not_in plans as a null-aware anti join on a broadcast set") {
    val p = plan("q_join_not_in")
    // NOT IN needs three-valued logic: the planner must pick the null-aware
    // broadcast anti join, never a shuffled LeftAnti (which would keep
    // NULL-key probe rows and be wrong). BroadcastHashJoinExec prints the
    // isNullAwareAntiJoin flag as a trailing "true" after the build side;
    // AQE may then fold the whole join away when the build set is empty at
    // this sf, so the Initial Plan carries the evidence.
    assert("LeftAnti, Build(Right|Left), true".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("AQE re-plans a sort-merge join to broadcast from runtime stats") {
    // The reference's 'jobmanager.scheduler: Adaptive' analog (SURVEY 2A):
    // at planning time the dim's post-filter size is unknown (static
    // broadcast disabled), so the initial plan is the safe SMJ; after the
    // dim's shuffle stage materializes, AQE sees the true few-row size and
    // swaps in a broadcast join. At 100 TB this is what rescues plans whose
    // selectivity estimates were wrong by orders of magnitude.
    import org.apache.spark.sql.functions._
    val s = SparkFixture.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    val fact = s.read.parquet(s"${SparkFixture.sf}/lineitem.parquet")
    val dim = s.read.parquet(s"${SparkFixture.sf}/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
    val df = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val initial = df.queryExecution.executedPlan.toString
    assert(initial.contains("SortMergeJoin"), initial.take(2000))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan.take(2000))
  }

  test("q_join_dpp prunes fact partitions from the dim side's broadcast") {
    val p = plan("q_join_dpp")
    // the fact scan's PartitionFilters must carry the runtime subquery —
    // directory-level skipping decided at execution, not planning
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(2000))
  }

  test("q_join_bloom_runtime probes a runtime bloom filter before the shuffle") {
    val p = plan("q_join_bloom_runtime")
    // InjectRuntimeFilter must have pushed a might_contain probe over the
    // fact side's scan stage: rows are pruned BEFORE the exchange feeding
    // the sort-merge join, which is where 100 TB plans win or lose.
    assert(p.contains("might_contain"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      p.take(2000))
  }
}
