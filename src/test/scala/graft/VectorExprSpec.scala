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
}
