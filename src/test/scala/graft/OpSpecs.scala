package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic spot-checks beyond the DuckDB oracle. */
class OpSpecs extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("approx_count_distinct is within 5% of exact") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx sketch tracks the exact quantiles") {
    val approx = SparkEntry.queries("q_agg_percentile_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((k, (p50e, p90e)) <- exact) {
      val (p50a, p90a) = approx(k)
      assert(math.abs(p50a - p50e) <= 1.0, s"$k p50: approx=$p50a exact=$p50e")
      assert(math.abs(p90a - p90e) <= 1.0, s"$k p90: approx=$p90a exact=$p90e")
    }
  }

  test("minhash LSH finds the planted near-duplicates") {
    val pairs = SparkEntry.queries("q_ext_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc_id < 50 each got a planted near-dup at doc_id + 1,000,000
    val found = (0L until 50L).count(i => pairs.contains((i, i + 1000000L)))
    assert(found >= 40, s"only $found/50 planted near-dup pairs found")
  }

  test("cosine top-k matches a driver-side brute force") {
    val topk = SparkEntry.queries("q_ext_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = rows(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = rows.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, BigDecimal(cos(v, q)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    assert(topk.map(_._1).toSeq == expect.map(_._1), s"got=${topk.toSeq} want=$expect")
  }

  test("simhash: planted near-dups are within small Hamming radius of originals") {
    val sigs = SparkEntry.queries("q_ext_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dists = (0L until 30L).map { i =>
      java.lang.Integer.bitCount(sigs(i) ^ sigs(i + 2000000L))
    }
    // a one-word suffix flips few votes: most planted pairs stay within 4 bits
    assert(dists.count(_ <= 4) >= 24, s"hamming distances: $dists")
    // unrelated docs are NOT near: median pair distance is large
    val unrelated = (0L until 29L).map(i => java.lang.Integer.bitCount(sigs(i) ^ sigs(i + 1)))
    assert(unrelated.count(_ <= 2) < 10, s"unrelated too close: $unrelated")
  }

  test("embedding near-dup finds every planted exact copy at cos=1") {
    val pairs = SparkEntry.queries("q_ext_embedding_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 1000000L }
    assert(planted.length == 25, s"found ${planted.length}/25 planted copies")
    assert(planted.forall(_._3 >= 0.999999))
  }

  test("exact dedup is idempotent") {
    val once = SparkEntry.queries("q_ext_exact_dedup")(spark, sf)
    assert(once.count() == once.distinct().count())
  }

  test("set algebra: intersect ⊆ each side; union-distinct of self = distinct") {
    val a = Tables.orders(spark, sf).filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("custkey"))
    val b = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    assert(a.intersect(b).except(a.distinct()).count() == 0)
    assert(a.intersect(b).except(b.distinct()).count() == 0)
    assert(a.union(a).distinct().count() == a.distinct().count())
  }

  test("bag set ops: multiplicity identity |A EXCEPT ALL B| + |A INTERSECT ALL B| = |A|") {
    // Bag semantics: every row of A lands in exactly one of the two outputs
    // (EXCEPT ALL keeps count(A)-count(B) copies, INTERSECT ALL keeps
    // min(count(A), count(B))) — the identity the distinct forms violate.
    val a = Tables.orders(spark, sf).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val inter = a.intersectAll(
      Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
    val exc = a.exceptAll(
      Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
    assert(inter.count() + exc.count() == a.count())
    // and the distinct forms are the support sets of the bag forms
    assert(inter.distinct().exceptAll(a.distinct()).count() == 0)
  }

  test("null-safe join matches NULL keys to each other; plain join drops them") {
    val out = SparkEntry.queries("q_join_null_safe")(spark, sf)
    val nullRows = out.filter(col("nk").isNull).count()
    assert(nullRows > 0, "NULL <=> NULL must match")
    // plain equality would produce exactly the non-null subset
    val plain = out.filter(col("nk").isNotNull).count()
    assert(out.count() == nullRows + plain)
  }

  test("string_agg is deterministic: sorted key roster, independent of partitioning") {
    val once = SparkEntry.queries("q_agg_string_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // re-run over a different physical partitioning — same strings
    val again = Tables.orders(spark, sf).repartition(7)
      .filter(col("o_totalprice") > 350000)
      .groupBy("o_orderpriority")
      .agg(expr("array_join(transform(sort_array(collect_list(o_orderkey)), " +
        "x -> CAST(x AS STRING)), ',')").as("keys"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(once == again)
    for ((_, keys) <- once) {
      val ks = keys.split(',').map(_.toLong)
      assert(ks.sorted.sameElements(ks), "roster must be ascending")
    }
  }

  test("typed Welford UDAF matches built-in var_samp") {
    val ours = SparkEntry.queries("q_udaf_typed")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(round(var_samp(col("l_quantity")), 6).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, v) <- builtin)
      assert(math.abs(ours(k) - v) < 1e-5, s"$k: ours=${ours(k)} builtin=$v")
  }
}
