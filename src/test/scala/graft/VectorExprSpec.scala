package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native FloatDot expression: bit-parity with the HOF formulation and
  * actual participation in codegen. */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.sf

  test("float_dot is bit-identical to the zip_with/aggregate formulation") {
    graft.functions.VectorFunctions.registerOn(spark)
    val both = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("float_dot(embedding, embedding)").as("native"),
        expr("aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("native top-k result equals the HOF top-k result") {
    val a = SparkEntry.queries("q_ext_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = SparkEntry.queries("q_ext_cosine_topk_native")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions instance") {
    // full build-time wiring is exercised by graft.examples.ExtensionsDemo
    // (needs its own JVM: extensions bind at session construction)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext) // must not throw
  }

  test("float_dot runs inside whole-stage codegen (no fallback)") {
    graft.functions.VectorFunctions.registerOn(spark)
    val df = Tables.embeddings(spark, sf)
      .select(expr("float_dot(embedding, embedding)").as("d"))
      .filter(col("d") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n${plan.take(1000)}")
  }

  test("BoundedLevenshteinRule: banded rewrite fires and preserves every answer") {
    // parquet-backed (the production case): a filter over a scan cannot be
    // constant-folded away before the extra optimizer batch runs; nulls
    // injected on a doc_id stripe to cover null propagation
    val pairs = Tables.documents(spark, sf).select(
      when(col("doc_id") % 7 === 0, lit(null)).otherwise(
        substring(col("text"), 1, 12)).as("a"),
      substring(col("text"), 5, 12).as("b"))
    // logical-plan toString renders the threshold as `..., Some(k))`
    val banded3Arg = """levenshtein\(.*Some\(\d+\)\)""".r
    def results(q: String) = pairs
      .filter(expr(q)).selectExpr("coalesce(a,'_')", "coalesce(b,'_')")
      .collect().map(_.toSeq).toSet
    val naive = Seq("levenshtein(a, b) <= 2", "levenshtein(a, b) < 3",
      "2 >= levenshtein(a, b)", "3 > levenshtein(a, b)")
    val baseline = naive.map(results)
    spark.experimental.extraOptimizations ++= Seq(graft.plans.BoundedLevenshteinRule)
    try {
      // the rewrite must actually fire: every threshold form optimizes to
      // the 3-arg banded levenshtein
      for (q <- naive) {
        val p = pairs.filter(expr(q)).queryExecution.optimizedPlan.toString
        assert(banded3Arg.findFirstIn(p).isDefined, s"$q did not rewrite:\n$p")
      }
      // and every comparison form keeps its exact answer set
      for ((q, expect) <- naive.zip(baseline))
        assert(results(q) == expect, q)
      // guard: negative thresholds stay untouched (already always-false)
      val negPlan = pairs.filter(expr("levenshtein(a, b) <= -1"))
        .queryExecution.optimizedPlan.toString
      assert(banded3Arg.findFirstIn(negPlan).isEmpty, negPlan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BoundedLevenshteinRule)
    }
  }
}
