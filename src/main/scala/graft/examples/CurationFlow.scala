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

    // 5. pack the train half into 4096-token bins — the SAME two-pass
    //    prefix-sum assignment the registry queries use (shared helper, so
    //    the adaptive shard width cannot drift between the two)
    val packed = graft.ops.Pipeline.packAssignments(train)
      .withColumnRenamed("bin_id", "bin")

    // all funnel counts in ONE aggregation job over the flagged frame
    // (six independent count() actions would recompute the dedup window
    // and the gram join up to five times each)
    val flagged = docs
      .withColumn("is_dedup", row_number().over(keepBest) === 1)
      .withColumn("is_gated", col("is_dedup") &&
        nWords.between(10, 300) && meanW.between(2.0, 12.0))
      .join(contaminatedIds.withColumn("contaminated", lit(true)),
        Seq("doc_id"), "left")
      .withColumn("is_clean", col("is_gated") && col("doc_id") % 97 =!= 0 &&
        col("contaminated").isNull)
      .withColumn("is_train", col("is_clean") &&
        substring(md5(col("source")), 1, 2) >= "1a")
    val c = flagged.agg(count(lit(1)),
      sum(when(col("is_dedup"), 1L).otherwise(0L)),
      sum(when(col("is_gated"), 1L).otherwise(0L)),
      sum(when(col("is_clean"), 1L).otherwise(0L)),
      sum(when(col("is_train"), 1L).otherwise(0L))).head
    val counts = Seq(
      "raw" -> c.getLong(0),
      "deduped" -> c.getLong(1),
      "quality_gated" -> c.getLong(2),
      "decontaminated" -> c.getLong(3),
      "train" -> c.getLong(4),
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
    // coalesce: an all-filtered corpus yields zero packed rows, not an NPE
    println("bins used: " +
      packed.select(coalesce(max(col("bin")) + 1, lit(0L))).head.getLong(0))
    spark.stop()
  }
}
