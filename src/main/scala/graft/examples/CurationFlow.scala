package graft.examples

import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The north-star LLM-data curation ops composed as ONE end-to-end corpus
  * pipeline — the "a user of the reference could switch" demonstration on
  * the training-data side, complementing [[TutorialFlow]]'s replay of the
  * reference's streaming-table tutorial:
  *
  *  raw corpus
  *   → exact dedup, best copy wins (q_ext_dedup_keep_best policy)
  *   → Gopher quality gate (q_ext_gopher_quality bounds)
  *   → benchmark decontamination (q_ext_contamination 3-gram sweep)
  *   → leakage-safe train/test split on the source hash (q_ext_group_split)
  *   → fixed-capacity sequence packing of the train half (q_ext_seq_packing
  *     two-pass prefix sum)
  *
  * The stages are LAZY DataFrame transforms composed into one DAG, so
  * Catalyst optimizes across stage boundaries (the dedup window, the gate
  * predicates and the gram explode all read ONE corpus scan lineage; no
  * stage materializes an intermediate table). ModuleSpecs proves each
  * stage's survivors agree with the standalone oracle-verified registry
  * queries.
  *
  * Run: sbt "runMain graft.examples.CurationFlow"
  */
object CurationFlow {

  /** Per-stage surviving-row counts plus the packed train corpus. */
  def run(s: SparkSession, d: String): (DataFrame, Seq[(String, Long)]) = {
    val docs = Tables.documents(s, d)
      .select("doc_id", "lang", "source", "n_chars", "text")

    // 1. exact dedup, best copy wins: longest text, then smallest id
    val keepBest = Window.partitionBy(md5(col("text")))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val deduped = docs.withColumn("rn", row_number().over(keepBest))
      .filter(col("rn") === 1).drop("rn")

    // 2. Gopher-style gate: word count and mean word length inside bounds
    val nWords = TextOps.nWords
    val meanW = length(regexp_replace(col("text"), " ", "")).cast("long")
      .cast("double") / nullif(nWords, lit(0L))
    val gated = deduped.filter(nWords.between(10, 300) && meanW.between(2.0, 12.0))

    // 3. decontamination: drop the benchmark slice itself (doc_id % 97 = 0)
    //    and every doc sharing a word 3-gram with it
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(TextOps.shingles(3)).as("gram"))
    val benchGrams = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
    val contaminatedIds = grams.filter(col("doc_id") % 97 =!= 0)
      .join(benchGrams, Seq("gram"))
      .select("doc_id").distinct()
    val clean = gated.filter(col("doc_id") % 97 =!= 0)
      .join(contaminatedIds, Seq("doc_id"), "left_anti")

    // 4. leakage-safe split: every doc of a source lands on one side
    val splitDf = clean.withColumn("split",
      when(substring(md5(col("source")), 1, 2) < "1a", "test").otherwise("train"))
    val train = splitDf.filter(col("split") === "train")

    // 5. pack the train half into 4096-token bins (two-pass prefix sum:
    //    per-shard partitioned cumsum + tiny shard-offsets window)
    val width = 1024L
    val toks = train.select(col("doc_id"), nWords.as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $width"))
    val wIntra = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wShard = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy("shard").agg(sum("n_tokens").as("shard_total"))
      .withColumn("shard_off", coalesce(sum("shard_total").over(wShard), lit(0L)))
      .select("shard", "shard_off")
    val packed = toks.withColumn("cum", sum("n_tokens").over(wIntra))
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("start_offset", col("cum") - col("n_tokens") + col("shard_off"))
      .withColumn("bin", expr("start_offset div 4096"))
      .select("doc_id", "n_tokens", "start_offset", "bin")

    val counts = Seq(
      "raw" -> docs.count(),
      "deduped" -> deduped.count(),
      "quality_gated" -> gated.count(),
      "decontaminated" -> clean.count(),
      "train" -> train.count(),
      "packed" -> packed.count())
    (packed.orderBy("doc_id"), counts)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-flow")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val (packed, counts) = run(spark, sf)
    counts.foreach { case (stage, n) => println(f"$stage%-16s $n%7d docs") }
    println(s"bins used: ${packed.select(max(col("bin"))).head.getLong(0) + 1}")
    spark.stop()
  }
}
