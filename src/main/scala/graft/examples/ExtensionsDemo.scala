package graft.examples

import org.apache.spark.sql.SparkSession

/** Session-extension wiring demo: a session built with
  * `withExtensions(new GraftExtensions)` has the engine's native functions
  * available in SQL from the start — the production deployment path
  * (equivalently `--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * Run: sbt "runMain graft.examples.ExtensionsDemo"
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-demo")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT vec_id, round(float_dot(embedding, embedding), 4) AS sq_norm
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet`
        |ORDER BY vec_id LIMIT 5""".stripMargin)
    r.show()
    require(r.count() == 5, "extension-injected float_dot must be usable in SQL")
    val tk = spark.sql(
      """SELECT label, topk_pairs(float_dot(embedding, embedding), vec_id, 2) AS top2
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet`
        |GROUP BY label ORDER BY label LIMIT 3""".stripMargin)
    tk.show(truncate = false)
    require(tk.count() == 3, "extension-injected topk_pairs must aggregate in SQL")
    // the injected optimizer rule rewrites the natural unbounded
    // edit-distance predicate to the banded O(len·k) form
    val lev = spark.sql(
      """SELECT count(*) AS n FROM parquet.`/root/testdata/sf0.001/documents.parquet`
        |WHERE levenshtein(substring(text, 1, 40), substring(text, 2, 40)) <= 10""".stripMargin)
    val levPlan = lev.queryExecution.optimizedPlan.toString
    require(levPlan.contains("Some(10)"),
      s"BoundedLevenshteinRule must fire at session build time:\n$levPlan")
    lev.show()
    println("extensions OK: float_dot + topk_pairs + banded-levenshtein rule " +
      "injected at session build time")
    spark.stop()
  }
}
