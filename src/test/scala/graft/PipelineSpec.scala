package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic + scale properties of the training-data pipeline family
  * (graft.ops.Pipeline) beyond the DuckDB oracle's value check. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stratified sample: hash rates land near targets, reruns identical") {
    val docs = Tables.documents(spark, sf)
    val totalEn = docs.filter("lang = 'en'").count().toDouble
    val totalOther = docs.filter("lang <> 'en'").count().toDouble
    val got = run("q_ext_stratified_sample").collect()
    val en = got.count(_.getString(1) == "en") / totalEn
    val other = got.count(_.getString(1) != "en") / totalOther
    assert(en > 0.35 && en < 0.65, s"en keep rate $en, expected ~0.50")
    assert(other > 0.08 && other < 0.32, s"non-en keep rate $other, expected ~0.20")
    assert(got.map(_.getLong(0)).toSeq ==
      run("q_ext_stratified_sample").collect().map(_.getLong(0)).toSeq)
  }

  test("group split: no source leaks across train/test") {
    val bySource = run("q_ext_group_split")
      .groupBy("source").agg(org.apache.spark.sql.functions.countDistinct("split").as("k"))
    assert(bySource.filter("k > 1").count() == 0, "a source appears in both splits")
    val splits = run("q_ext_group_split").select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "test"))
  }

  test("per-group reservoir: at most k rows per stratum, stable") {
    val got = run("q_ext_reservoir_per_group").collect()
    val perLang = got.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 5))
    assert(got.map(_.getLong(1)).toSeq ==
      run("q_ext_reservoir_per_group").collect().map(_.getLong(1)).toSeq)
  }

  test("gopher gate: keep implies the stated bounds") {
    run("q_ext_gopher_quality").collect().filter(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(1) >= 10 && r.getLong(1) <= 300)
      assert(r.getDouble(2) >= 2.0 && r.getDouble(2) <= 12.0)
    }
  }

  test("repetition filter: ratio = top_freq / n_words, within (0, 1]") {
    run("q_ext_repetition_filter").collect().foreach { r =>
      val expect = r.getLong(1).toDouble / r.getLong(2)
      assert(r.getDouble(3) == expect && expect > 0.0 && expect <= 1.0)
    }
  }

  test("vocab top-k: counts non-increasing, words unique") {
    val rows = run("q_ext_vocab_topk").collect()
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("quality percentile: top half per language by length, rank-exact") {
    val rows = run("q_ext_quality_percentile").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.forall(_._4 >= 0.5))
    // within each language the kept docs are the LONGEST ~half
    val byLang = Tables.documents(spark, SparkFixture.sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    for ((lang, docs) <- byLang) {
      val kept = rows.filter(_._2 == lang).map(_._1).toSet
      val sorted = docs.sortBy(d => (d._3, d._1))
      // pr = p/(n-1) ≥ 0.5 ⟺ zero-based position p ≥ ceil((n-1)/2) for n ≥ 2;
      // for n = 1 both engines DEFINE percent_rank as 0.0, so a singleton
      // stratum is dropped (consistently on both sides of the oracle)
      val expected =
        if (sorted.length == 1) Set.empty[Long]
        else sorted.drop(math.ceil((sorted.length - 1) / 2.0).toInt)
          .map(_._1).toSet
      assert(kept == expected, s"$lang: kept ${kept.size} of ${docs.length}")
    }
  }

  test("seq packing: offsets are an exact prefix sum; bins are offset/4096") {
    val rows = run("q_ext_seq_packing").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum, s"doc ${r.getLong(0)} offset")
      assert(r.getLong(3) == r.getLong(2) / 4096)
      cum += r.getLong(1)
    }
  }

  test("pii scrub: no digits survive; count matches removed chars") {
    run("q_ext_pii_scrub").collect().foreach { r =>
      if (!r.isNullAt(1)) {
        assert(!r.getString(1).exists(_.isDigit), s"digits left: ${r.getString(1)}")
        assert(r.getInt(2) >= 0)
      }
    }
  }

  test("sampling/split/scrub are map-only before the output sort (no shuffle)") {
    // hash-based decisions must not shuffle: the only Exchange allowed in the
    // plan is the final presentation ORDER BY (rangepartitioning)
    for (q <- Seq("q_ext_stratified_sample", "q_ext_group_split", "q_ext_pii_scrub")) {
      val p = run(q).queryExecution.executedPlan.toString
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toList
      assert(exchanges.forall(_.contains("rangepartitioning")),
        s"$q has a non-sort shuffle: $exchanges")
    }
  }

  test("pack concat: bins contiguous, token totals conserved, capacity respected") {
    val bins = run("q_ext_pack_concat").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(bins.map(_._1).toSeq == (0L until bins.length).toSeq, "bins not contiguous")
    val corpusTokens = run("q_ext_seq_packing").collect().map(_.getLong(1)).sum
    assert(bins.map(_._3).sum == corpusTokens, "token mass lost in packing")
    // a bin exceeds capacity only by its overflowing last doc: every bin
    // STARTS below the 4096 boundary, so bin token count < 4096 + max doc
    val maxDoc = run("q_ext_seq_packing").collect().map(_.getLong(1)).max
    assert(bins.forall(_._3 < 4096 + maxDoc))
    assert(bins.forall(b => b._4.length == 32 && b._2 >= 1))
  }

  test("null profile: one row per column, stats match direct queries") {
    val o = Tables.orders(spark, sf)
    val rows = run("q_ext_null_profile").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice"))
    val n = o.count()
    for (r <- rows) {
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == n, s"${r.getString(0)}: testdata has no nulls")
    }
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("o_orderstatus").getLong(3) ==
      o.select("o_orderstatus").distinct().count())
    assert(byCol("o_orderkey").getString(4) == "0")
    assert(byCol("o_orderkey").getString(5) == (n - 1).toString)
    // the profile is two COLUMN-DISJOINT passes (numeric multi-distinct
    // HashAggregate + string value census) that together read each column
    // exactly once: exactly two scans, each pruned to its own column set
    val plan = run("q_ext_null_profile").queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"profile must read the table in exactly 2 column-disjoint passes, saw $scans")
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val colSets = schemas.map(_.split(",").map(_.takeWhile(_ != ':').trim).toSet)
    assert(colSets.size == 2 && colSets(0).intersect(colSets(1)).isEmpty,
      s"the two passes must prune to disjoint column sets, saw $schemas")
    // the numeric multi-distinct Expand branch must stay HashAggregate
    // (string min/max demotes it to interpreted SortAggregate); the only
    // SortAggregate allowed is the census-side min/max over the BOUNDED
    // (col, value) relation, which sits above the census's own HashAggregate
    val expandBranch = plan.split("SortAggregate").head
    assert(expandBranch.contains("Expand") && expandBranch.contains("HashAggregate"),
      "numeric profile pass must run as HashAggregate over Expand before any SortAggregate appears")
  }
}
