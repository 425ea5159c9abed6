package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation family (graft.ops.Curation): cluster resolution, BM25,
  * decontamination, policy-ranked canonical selection. The DuckDB oracle
  * covers value parity; these tests pin the semantic PROPERTIES the oracle
  * hash alone would not explain. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dedup clusters: labels are the per-component minimum, chains collapse") {
    val got = run("q_ext_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the edge rule links id -> 2*id: every doc shares a component with its
    // double, and the component label is the chain's odd root
    val maxId = got.keys.max
    for (id <- got.keys if id > 0 && id * 2 <= maxId)
      assert(got(id) == got(id * 2), s"$id and ${id * 2} split")
    // the label is the minimum member: strip factors of 2 → odd root
    def oddRoot(x: Long): Long = if (x == 0) 0 else { var v = x; while (v % 2 == 0) v /= 2; v }
    for ((id, comp) <- got) assert(comp == oddRoot(id), s"doc $id: $comp")
  }

  test("dedup clusters converges identically under different partitioning") {
    val base = run("q_ext_dedup_clusters").collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(run("q_ext_dedup_clusters").collect().map(_.toSeq).toSet == base)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("bm25: zero-tf docs score 0; scores rise with tf at equal length") {
    val scores = run("q_ext_bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tfs = Tables.documents(spark, sf).select(col("doc_id"),
        size(expr("filter(split(text,' '), w -> w = 'data')")) +
        size(expr("filter(split(text,' '), w -> w = 'model')")) +
        size(expr("filter(split(text,' '), w -> w = 'the')")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, s) <- scores) {
      if (tfs(id) == 0) assert(s == 0.0, s"doc $id: no query terms but bm25=$s")
      else assert(s > 0.0, s"doc $id: tf=${tfs(id)} but bm25=$s")
    }
  }

  test("minhash jaccard: planted near-dups recalled, estimate tracks truth") {
    val rows = run("q_ext_minhash_jaccard").collect()
    val planted = rows.filter(r => r.getLong(1) - r.getLong(0) == 1000000L)
    assert(planted.length >= 25, s"only ${planted.length}/30 planted pairs recalled")
    for (r <- rows) {
      val (est, truth) = (r.getDouble(3), r.getDouble(4))
      assert(est >= 0.5 - 1e-9, "candidates must share a full band (>=4/8 hashes)")
      assert(math.abs(est - truth) <= 0.5, s"estimate $est far from truth $truth")
      assert(truth > 0.0, "banded candidates must share at least one shingle")
    }
  }

  test("dedup e2e: planted probes land in their originals' clusters") {
    val rows = run("q_ext_dedup_e2e").collect()
    // cluster_id = min member; a planted probe (id + 1e6) clustered with
    // its original yields a cluster rooted at the original with the probe
    // as max member
    val probePaired = rows.count(r =>
      r.getLong(0) < 1000000L && r.getLong(2) == r.getLong(0) + 1000000L)
    assert(probePaired >= 20, s"only $probePaired/30 probe clusters rooted at originals")
    for (r <- rows) assert(r.getLong(1) >= 2, "every emitted cluster has >= 2 members")
  }

  test("unigram logprob: negative scores, token counts match, exact micro identity") {
    val rows = run("q_ext_unigram_logprob").collect()
    // zero-token docs produce no exploded rows on either engine, so the
    // query's domain is exactly the docs with >= 1 token
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(expr("filter(split(text,' '), x -> x <> '')")))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
      .filter(_._2 > 0).toMap
    assert(rows.length == toks.size)
    for (r <- rows) {
      val (id, n, sum, avg) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n == toks(id))
      assert(avg < 0 && avg > -20, s"doc $id: implausible avg logprob $avg")
      assert(math.abs(avg - sum / 1000000.0 / n) < 1e-12)
    }
  }

  test("kl divergence: near-zero lower bound, every language present") {
    val rows = run("q_ext_kl_language").collect()
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == langs)
    // KL >= 0 mathematically; floor quantization can undershoot by at most
    // |vocab| nanos per language
    for (r <- rows) assert(r.getDouble(2) > -0.001 && r.getDouble(2) < 10.0)
  }

  test("mixture weights: shares normalize, sub-linear flattening holds") {
    val rows = run("q_ext_mixture_weights").collect()
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // tokens^0.7 flattens: the biggest source's weight share is below its
    // raw token share, the smallest source's is above
    val totalToks = rows.map(_.getLong(2)).sum.toDouble
    val biggest = rows.maxBy(_.getLong(2))
    val smallest = rows.minBy(_.getLong(2))
    assert(biggest.getDouble(4) < biggest.getLong(2) / totalToks)
    assert(smallest.getDouble(4) > smallest.getLong(2) / totalToks)
    // weight is monotone in tokens
    for (Array(a, b) <- rows.sortBy(_.getLong(2)).sliding(2).map(_.toArray))
      assert(a.getLong(3) <= b.getLong(3))
  }

  test("doc chunks: stride-40 windows tile every doc, sizes and edges consistent") {
    val rows = run("q_ext_doc_chunks").collect()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(expr("filter(split(text,' '), x -> x <> '')")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).filter(_._2 > 0).toMap
    for ((id, cs) <- rows.groupBy(_.getLong(0))) {
      val sorted = cs.sortBy(_.getLong(1))
      val n = toks(id)
      // dense chunk indices, stride-40 starts, expected chunk count: starts
      // run while they contribute new tokens (start <= max(n-10, 1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_.getLong(2)).toSeq ==
        sorted.indices.map(i => 1L + 40L * i).toSeq)
      assert(sorted.length == (math.max(n - 10, 1) + 39) / 40)
      for (c <- sorted) {
        val (start, len) = (c.getLong(2), c.getLong(3))
        assert(len >= 1 && len <= 50 && start + len - 1 <= n)
      }
      // the final chunk reaches the doc end; no chunk is a subset of its
      // predecessor (each adds at least one new token)
      assert(sorted.last.getLong(2) + sorted.last.getLong(3) - 1 == n)
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1)
        assert(b.getLong(2) + b.getLong(3) - 1 > a.getLong(2) + a.getLong(3) - 1)
    }
    assert(rows.map(_.getLong(0)).toSet == toks.keySet)
  }

  test("contamination: flagged docs genuinely share a 3-gram with the benchmark") {
    val rows = run("q_ext_contamination").collect()
    val flagged = rows.filter(_.getBoolean(2)).map(_.getLong(0))
    assert(flagged.nonEmpty, "synthetic corpus should have some 3-gram overlap")
    def grams(filter: String): Set[String] =
      Tables.documents(spark, sf).filter(expr(filter))
        .select(explode(expr(
          """array_distinct(transform(sequence(1, size(split(text,' ')) - 2),
            |i -> concat_ws(' ', element_at(split(text,' '), i),
            |  element_at(split(text,' '), i + 1), element_at(split(text,' '), i + 2))))"""
            .stripMargin)))
        .collect().map(_.getString(0)).toSet
    val bench = grams("doc_id % 97 = 0")
    val flaggedGrams = grams(s"doc_id IN (${flagged.take(20).mkString(",")})")
    assert(flagged.take(20).nonEmpty && (bench & flaggedGrams).nonEmpty)
    // and benchmark docs themselves are excluded from the output
    assert(rows.forall(_.getLong(0) % 97 != 0))
  }

  test("dedup keep-best: planted copies lose to their originals; sizes correct") {
    val rows = run("q_ext_dedup_keep_best").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val ids = rows.map(_._1).toSet
    // every planted copy (id ≥ 1e6) has identical text to a surviving
    // original with the same n_chars and a smaller id → the copy never wins
    assert(!ids.exists(_ >= 1000000L), "a planted copy survived")
    assert(rows.count(_._2 == 2L) == 50, "doc_id<50 groups have size 2")
    assert(rows.forall { case (id, n) => (id < 50) == (n == 2L) })
  }

  test("incremental dedup: planted re-crawl resolves to the right status per side") {
    val st = run("q_ext_incremental_dedup").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val planted = st.keys.filter(_ >= 1000000L)
    assert(planted.nonEmpty)
    for (id <- planted) {
      val base = id - 1000000L
      // a re-crawled EVEN doc already lives in the snapshot; a re-crawled
      // ODD doc only collides with its in-batch original (smaller id wins)
      val expect = if (base % 2 == 0) "dup_vs_snapshot" else "dup_in_batch"
      assert(st(id) == expect, s"copy of $base: ${st(id)}")
    }
    // an original odd doc can never lose the in-batch race: its only
    // collision partner is its planted copy, which carries the LARGER id
    assert(st.count(_._2 == "new") > 0)
    for ((id, s) <- st if id < 1000000L)
      assert(s != "dup_in_batch", s"original $id lost the in-batch race")
  }

  test("word entropy: bounded by ln(n), exact at the all-distinct corner") {
    val got = run("q_ext_word_entropy").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    val distinctCounts = Tables.documents(spark, sf)
      .select(col("doc_id"), size(array_distinct(expr(
        "filter(split(text,' '), x -> x <> '')"))).cast("long").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (n, hMicro, h)) <- got) {
      assert(hMicro >= 0 && h <= math.log(n.toDouble) + 1e-6, s"doc $id")
      // all-distinct words ⇒ every c = 1 ⇒ Σ c·ln c = 0 ⇒ H = ln n exactly
      if (distinctCounts(id) == n)
        assert(hMicro == math.floor(math.log(n.toDouble) * 1e6).toLong, s"doc $id")
    }
  }

  test("pagerank: hub suppliers outrank parts; floor holds; deterministic") {
    val rows = run("q_ext_pagerank").collect()
    assert(rows.length == 100)
    // suppliers aggregate hundreds of part edges each (10 suppliers vs 200
    // parts at sf0.001) — the entire supplier set must head the ranking
    assert(rows.take(10).forall(_.getString(1) == "supplier"),
      "a part outranked a supplier hub")
    // pr = 0.15 + 0.85·Σcontrib ≥ 0.15: the damping floor in micros
    assert(rows.forall(_.getLong(3) >= 150000L))
    val prs = rows.map(_.getLong(3))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b }, "not rank-sorted")
    // integer arithmetic ⇒ identical under different partitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(run("q_ext_pagerank").collect().map(_.toSeq).toSeq ==
      rows.map(_.toSeq).toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("edit distance: bounded verify over minhash candidates; probes surface") {
    val rows = run("q_ext_edit_distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty && rows.exists(_._3 == 0),
      "exact-dup candidate pairs must verify at distance 0")
    assert(rows.forall { case (a, b, d) => a < b && d >= 0 && d <= 20 })
    // the planted suffix probes (doc_id + 1e6) are guaranteed minhash
    // candidates and must verify at small distance (≤ the 16-char suffix)
    val probes = rows.filter { case (a, b, _) => b == a + 1000000L }
    assert(probes.nonEmpty, "planted probe pairs missing from the verify")
    assert(probes.forall(_._3 <= 16), probes.mkString(","))
    // residual filter: a pair never crosses languages
    val langOf = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lang(id: Long) = langOf(if (id >= 1000000L) id - 1000000L else id)
    assert(rows.forall { case (a, b, _) => lang(a) == lang(b) },
      "a pair escaped the language residual")
  }

  test("semdedup: every planted near-copy is dropped against its original") {
    val rows = run("q_ext_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    val planted = rows.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    for ((pid, cid, dupOf, kept) <- planted) {
      assert(!kept && dupOf.contains(pid - 1000000L),
        s"planted $pid survived or matched the wrong original ($dupOf)")
      // SemDeDup's core assumption: a true near-copy lands in the SAME
      // cluster as its original — otherwise cluster-local pruning misses it
      assert(byId(pid - 1000000L)._2 == cid, s"planted $pid changed cluster")
    }
    // random 64-d pairs never reach cos > 0.9: all originals are kept
    assert(rows.filter(_._1 < 1000000L).forall(_._4),
      "a non-planted vector was dropped — τ=0.9 crossed by random pairs")
    // dominated rule is order-independent ⇒ identical under repartitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(run("q_ext_semdedup").collect().map(_.toSeq).toSet ==
      rows.map(r => Seq[Any](r._1, r._2, r._3.orNull, r._4)).toSet)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("boilerplate: df threshold separates shared from unique shingles") {
    val rows = run("q_ext_boilerplate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    for ((id, n, nb, frac, keep) <- rows) {
      assert(n > 0 && nb >= 0 && nb <= n, s"doc $id: $nb of $n")
      assert(frac == nb.toDouble / n.toDouble, s"doc $id: frac mismatch")
      assert(keep == (frac < 0.5), s"doc $id: keep flag inconsistent")
    }
    // the small-vocab corpus genuinely shares trigrams across docs: the
    // signal must be non-degenerate in BOTH directions at sf0.001
    assert(rows.exists(_._3 > 0), "no boilerplate found anywhere")
    assert(rows.exists(r => r._3 < r._2), "every shingle flagged boilerplate")
    // cross-check one doc's count against a direct corpus recount
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ops.TextOps.words.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(graft.ops.TextOps.shingles(3)).as("g"))
    val df = sh.groupBy("g").agg(countDistinct(col("doc_id")).as("df"))
    val expected = sh.join(df, Seq("g"))
      .filter(col("doc_id") === rows.head._1)
      .agg(sum(when(col("df") >= 3, 1L).otherwise(0L)))
      .collect()(0).getLong(0)
    assert(rows.head._3 == expected, "df recount disagrees")
  }

  test("text norm: planted case/punct variants collapse onto their originals") {
    val rows = run("q_ext_text_norm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    val planted = rows.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    for ((pid, canon, nv, isCanon) <- planted) {
      // the variant can never be canonical (its original has a smaller id)
      assert(!isCanon && canon < 1000000L, s"variant $pid canon=$canon")
      assert(nv >= 2, s"variant $pid in a singleton group")
      // its original must sit in the SAME group with the SAME canon
      assert(byId(pid - 1000000L)._2 == canon, s"variant $pid split from original")
    }
    // canon is the group min and appears exactly once per group as canonical
    val groups = rows.groupBy(_._2)
    for ((canon, members) <- groups) {
      assert(members.map(_._1).min == canon)
      assert(members.count(_._4) == 1)
      assert(members.forall(_._3 == members.length.toLong))
    }
  }

  test("paragraph dedup: quoted chunks stripped, filler kept, originals intact") {
    val rows = SparkEntry.queries("q_ext_paragraph_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val planted = rows.filter(_._1 >= 2000000L)
    assert(planted.size == 25)
    for ((id, (text, nKept)) <- planted) {
      val orig = id - 2000000L
      // the two quoted grid chunks are duplicates of the original's first
      // 16 words and must be stripped; only the unique filler chunk stays
      assert(nKept == 1L, s"doc $id kept $nKept chunks")
      assert(text == (0 until 8).map(i => s"u${orig}f$i").mkString(" "),
        s"doc $id kept: $text")
    }
    // every original's own FIRST chunk is its first global occurrence
    // (doc_id order), so no original disappears entirely... unless all its
    // chunks echo an earlier doc — allow that, but the overwhelming bulk
    // must survive with their leading chunk intact
    val originals = rows.filter(_._1 < 2000000L)
    assert(originals.size >= 490)
  }
}
