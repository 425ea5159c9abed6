package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (SURVEY.md §1.3 / the reference's hash
  * bucketing, tutorial/guide.md:28-29): when both sides are bucketed on the
  * join key, the sort-merge join needs NO shuffle exchange — the layout
  * pre-pays the partitioning once at write time. This is the primary
  * shuffle-elimination lever for repeated fact-fact joins at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("join of two tables bucketed on the key runs without a shuffle") {
    val sf = SparkFixture.sf
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // force the fact-fact (SMJ) path: broadcast would mask the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("li_bucketed")
          .join(spark.table("o_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_quantity", "o_totalprice")
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1500))
        // bucket layout satisfies the join's distribution: no Exchange on
        // either side of the SMJ
        assert(!plan.contains("Exchange hashpartitioning"),
          plan.linesIterator.take(25).mkString("\n"))
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // row-count parity with the unbucketed join
    val expect = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expect)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
