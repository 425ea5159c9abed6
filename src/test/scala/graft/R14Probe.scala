package graft
import org.apache.spark.sql.functions._

/** Scratch timing probe for round-14 optimization work (test scope, not a
  * declared surface). Times pageRankMicro's phases at sf0.1 under the bench
  * session shape. */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    spark.read.parquet(s"$sf/lineitem.parquet").groupBy("l_returnflag").count().collect()

    // null_profile variants: current vs ObjectHashAggregate-nudged
    val o = Tables.documents(spark, sf).sparkSession
      .read.parquet(s"$sf/orders.parquet")
    def stats(c: String, suf: String) = Seq(
      count(col(c)).as(s"nn_$suf"), countDistinct(col(c)).as(s"nd_$suf"),
      min(col(c)).as(s"mn_$suf"), max(col(c)).as(s"mx_$suf"))
    def profile(extra: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame = {
      val g = o.agg(count(lit(1)).as("n"),
        (stats("o_orderkey", "ok") ++ stats("o_custkey", "ck") ++
          stats("o_orderstatus", "os") ++ stats("o_totalprice", "tp") ++
          stats("o_orderdate", "od") ++ stats("o_orderpriority", "op") ++ extra): _*)
      g.selectExpr(
        """stack(6,
          |  'o_custkey', n, nn_ck, nd_ck, CAST(mn_ck AS STRING), CAST(mx_ck AS STRING),
          |  'o_orderdate', n, nn_od, nd_od, CAST(mn_od AS STRING), CAST(mx_od AS STRING),
          |  'o_orderkey', n, nn_ok, nd_ok, CAST(mn_ok AS STRING), CAST(mx_ok AS STRING),
          |  'o_orderpriority', n, nn_op, nd_op, mn_op, mx_op,
          |  'o_orderstatus', n, nn_os, nd_os, mn_os, mx_os,
          |  'o_totalprice', n, nn_tp, nd_tp,
          |    CAST(CAST(mn_tp AS DECIMAL(18,2)) AS STRING),
          |    CAST(CAST(mx_tp AS DECIMAL(18,2)) AS STRING)
          |) AS (col, n_rows, n_nonnull, n_distinct, min_v, max_v)""".stripMargin)
        .orderBy("col")
    }
    def profileSplit(): org.apache.spark.sql.DataFrame = {
      // numeric/timestamp columns: one multi-distinct pass, all buffers
      // primitive -> HashAggregate end to end
      val g = o.agg(count(lit(1)).as("n"),
        (stats("o_orderkey", "ok") ++ stats("o_custkey", "ck") ++
          stats("o_totalprice", "tp") ++ stats("o_orderdate", "od")): _*)
      val numRows = g.selectExpr(
        """stack(4,
          |  'o_custkey', n, nn_ck, nd_ck, CAST(mn_ck AS STRING), CAST(mx_ck AS STRING),
          |  'o_orderdate', n, nn_od, nd_od, CAST(mn_od AS STRING), CAST(mx_od AS STRING),
          |  'o_orderkey', n, nn_ok, nd_ok, CAST(mn_ok AS STRING), CAST(mx_ok AS STRING),
          |  'o_totalprice', n, nn_tp, nd_tp,
          |    CAST(CAST(mn_tp AS DECIMAL(18,2)) AS STRING),
          |    CAST(CAST(mx_tp AS DECIMAL(18,2)) AS STRING)
          |) AS (col, n_rows, n_nonnull, n_distinct, min_v, max_v)""".stripMargin)
      // string columns: a (col, value) census (string KEYS hash fine) whose
      // |distinct|-bounded output feeds the min/max
      val pairs = o.select(explode(array(
          struct(lit("o_orderstatus").as("c"), col("o_orderstatus").as("v")),
          struct(lit("o_orderpriority").as("c"), col("o_orderpriority").as("v")))).as("p"))
        .select(col("p.c").as("c"), col("p.v").as("v"))
      val strRows = pairs.groupBy("c", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("c").agg(sum("cnt").as("n_rows"),
          sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n_nonnull"),
          count("v").as("n_distinct"), min("v").as("min_v"), max("v").as("max_v"))
        .select(col("c").as("col"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_v"), col("max_v"))
      numRows.unionByName(strRows).orderBy("col")
    }
    val _ = (o, profile _, profileSplit _)
    // replicate ccMinLabel(fwd) inline, printing the plan each checkpoint
    import spark.implicits._
    val fwd = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    try {
      val (edges, _) = graft.IterCkpt.step(fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst"))))
      var labels: org.apache.spark.sql.DataFrame = null
      for (round <- 0 to 2) {
        val hopIn =
          if (labels != null)
            labels.unionByName(edges.join(labels, col("src") === col("id"))
                .select(col("dst").as("id"), col("comp")))
              .groupBy("id").agg(min("comp").as("comp"))
          else
            edges.select(col("dst").as("id"), col("src").as("comp"))
              .groupBy("id").agg(min("comp").as("mc"))
              .select(col("id"), least(col("mc"), col("id")).as("comp"))
        println(s"[probe] round $round hopIn plan:\n" +
          hopIn.queryExecution.analyzed.toString)
        val (hop, _) = graft.IterCkpt.step(hopIn)
        println(s"[probe] round $round hop ckpt OK, constraints: " +
          hop.queryExecution.analyzed.constraints.toString.take(400))
        val jump = hop.as("x")
          .join(hop.as("y"), col("x.comp") === col("y.id"), "left")
          .select(col("x.id"),
            least(col("x.comp"), coalesce(col("y.comp"), col("x.comp"))).as("comp"))
        println(s"[probe] round $round jump plan:\n" +
          jump.queryExecution.analyzed.toString)
        val (l2, _) = graft.IterCkpt.step(jump)
        println(s"[probe] round $round jump ckpt OK, constraints: " +
          l2.queryExecution.analyzed.constraints.toString.take(400))
        labels = l2
      }
      println("[probe] inline CC OK: " + labels.collect().mkString(","))
    } catch { case e: Throwable =>
      println("[probe] inline CC FAILED: " + e)
    }
    spark.stop()
  }
}
