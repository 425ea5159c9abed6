package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark-4-native surfaces (ops/SparkNative.scala) beyond their
  * DuckDB oracles, and the no-oracle HLL sketch contract. */
class SparkNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("recursive CTE agrees with the hand-rolled iterative closure") {
    // The native recursion and Curation's IterCkpt loop are two plans for
    // the same fixpoint; cross-check node counts per seed against a direct
    // closed-form walk of the doc→doc·2 chain.
    val rows = SparkEntry.queries("q_sql_recursive_cte")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val maxId = Tables.documents(spark, sf).agg(max("doc_id")).head().getLong(0)
    for ((seed, n, depth) <- rows) {
      var (node, hops) = (seed, 0L)
      while (node * 2 <= maxId) { node *= 2; hops += 1 }
      assert(n == hops + 1, s"seed=$seed")
      assert(depth == hops, s"seed=$seed")
    }
    assert(rows.map(_._1).toSeq == (1L to 8L))
  }

  test("variant extraction is the identity on the encoded columns") {
    val got = SparkEntry.queries("q_fn_variant")(spark, sf).limit(50).collect()
    val src = Tables.orders(spark, sf).orderBy("o_orderkey").limit(50)
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
      .collect()
    for ((g, e) <- got.zip(src)) {
      assert(g.getLong(0) == e.getLong(0))
      assert(g.getDouble(1) == e.getDouble(1)) // bit-exact JSON round-trip
      assert(g.getString(2) == e.getString(2))
      assert(g.getString(3) == e.getString(3))
    }
  }

  test("approx_top_k is exact when capacity exceeds the distinct count") {
    val got = SparkEntry.queries("q_agg_approx_top_k")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("HLL sketch: estimates within 2% and group-union == direct sketch") {
    val rows = SparkEntry.queries("q_agg_hll_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).contains("ALL") && rows.length == 4)
    for ((scope, est, exact) <- rows)
      assert(math.abs(est - exact).toDouble / exact <= 0.02,
        s"$scope: est=$est exact=$exact")
    // mergeability: union of per-group sketches = one whole-table sketch
    val direct = Tables.lineitem(spark, sf)
      .agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(l_partkey, 14)) AS BIGINT)"))
      .head().getLong(0)
    val merged = rows.find(_._1 == "ALL").get._2
    assert(merged == direct, s"union=$merged direct=$direct")
  }

  test("statestore reader exposes the aggregation state partitions") {
    // beyond the oracle: the read carries per-partition provenance
    val df = SparkEntry.queries("q_stream_state_read")(spark, sf)
    assert(df.columns.toSeq == Seq("user_id", "n_events", "max_value"))
    assert(df.count() ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }
}
