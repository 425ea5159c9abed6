package graft

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for round-14 candidates. Usage:
  *   sbt "Test/runMain graft.R14Probe2 <mode>"
  * Test scope, not a declared surface. */
object R14Probe2 {
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
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warmup
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().collect()

    args.headOption.getOrElse("all") match {
      case "mergemap_phases" =>
        // stage the table once (untimed via first full query run)
        noop(SparkEntry.queries("q_source_v2_pk_mergemap")(spark, d))
        // locate the staged table root from the temp warehouse
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val wh = Files.list(Paths.get("/tmp")).iterator().asScala
          .filter(_.getFileName.toString.startsWith("graft_v2_wh_"))
          .flatMap(p => {
            val t0 = p.resolve("v2db.db/mmap_li")
            if (Files.exists(t0)) Some(t0) else None
          }).toSeq.head
        println(s"[probe] table root: $wh")
        val tbl = graft.table.GraftCatalog.openPath(spark, wh.toString)
        val merged = tbl.read
        for (r <- 1 to 3) {
          t(s"merged read only (rep $r)")(noop(merged))
          t(s"merged+explode (rep $r)")(noop(
            merged.select(col("l_orderkey"), explode(col("attrs")).as(Seq("part", "flag")))))
          t(s"full with orderBy (rep $r)")(noop(
            merged.select(col("l_orderkey"), explode(col("attrs")).as(Seq("part", "flag")))
              .orderBy("l_orderkey", "part")))
        }
      case "mergemap_render" =>
        noop(SparkEntry.queries("q_source_v2_pk_mergemap")(spark, d))
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val root = Files.list(Paths.get("/tmp")).iterator().asScala
          .filter(_.getFileName.toString.startsWith("graft_v2_wh_"))
          .flatMap(p => {
            val t0 = p.resolve("v2db.db/mmap_li/data")
            if (Files.exists(t0)) Some(t0) else None
          }).toSeq.head
        val raw = spark.read.parquet(
          Files.walk(root).iterator().asScala
            .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq: _*)
        println(s"[probe] raw rows: ${raw.count()}; cols: ${raw.columns.mkString(",")}")
        val baseOrd = struct(col("seq").cast("long").as("s1"),
          col("__graft_seq").cast("long").as("s2"))
        val contrib =
          when(col("attrs").isNotNull, array(struct(
            baseOrd.getField("s1").as("s1"), baseOrd.getField("s2").as("s2"),
            col("attrs").as("v"))))
        for (r <- 1 to 2) {
          t(s"collect_list only (rep $r)")(noop(
            raw.groupBy("l_orderkey").agg(collect_list(contrib).as("buf"))))
          t(s"+ flatten+lambda sort (rep $r)")(noop(
            raw.groupBy("l_orderkey").agg(
              array_sort(flatten(collect_list(contrib)), (l, rr) =>
                when(l.getField("s1") < rr.getField("s1") ||
                  (l.getField("s1") === rr.getField("s1") &&
                    l.getField("s2") < rr.getField("s2")), -1)
                  .when(l.getField("s1") === rr.getField("s1") &&
                    l.getField("s2") === rr.getField("s2"), 0)
                  .otherwise(1)).as("pairs"))))
          // full current render
          val flat = flatten(collect_list(contrib))
          val pairs = array_sort(flat, (l, rr) =>
            when(l.getField("s1") < rr.getField("s1") ||
              (l.getField("s1") === rr.getField("s1") &&
                rr.getField("s2") > l.getField("s2")), -1)
              .when(l.getField("s1") === rr.getField("s1") &&
                l.getField("s2") === rr.getField("s2"), 0)
              .otherwise(1))
          val entries = array_sort(flatten(transform(pairs, x =>
            transform(map_entries(x.getField("v")), e => struct(
              x.getField("s1").as("s1"), x.getField("s2").as("s2"),
              e.getField("key").as("k"), e.getField("value").as("w"))))))
          val rev = reverse(entries)
          val dedup = filter(rev, (e, i) =>
            !exists(slice(rev, lit(1), i),
              x => x.getField("k") === e.getField("k")))
          val view = when(size(pairs) > 0, map_from_entries(
            transform(reverse(dedup), e => struct(
              e.getField("k").as("key"), e.getField("w").as("value")))))
          t(s"full current render (rep $r)")(noop(
            raw.groupBy("l_orderkey").agg(view.as("attrs"))))
          // candidate render: no pairs sort, k-sorted adjacent dedup
          val byKey = array_sort(flatten(transform(flat, x =>
            transform(map_entries(x.getField("v")), e => struct(
              e.getField("key").as("k"),
              x.getField("s1").as("s1"), x.getField("s2").as("s2"),
              e.getField("value").as("w"))))))
          val winners = filter(byKey, (e, i) =>
            (i === size(byKey) - 1) ||
              element_at(byKey, i + 2).getField("k") =!= e.getField("k"))
          val ordered = array_sort(transform(winners, e => struct(
            e.getField("s1").as("s1"), e.getField("s2").as("s2"),
            e.getField("k").as("k"), e.getField("w").as("w"))))
          val view2 = when(size(flat) > 0, map_from_entries(
            transform(ordered, e => struct(
              e.getField("k").as("key"), e.getField("w").as("value")))))
          t(s"candidate render (rep $r)")(noop(
            raw.groupBy("l_orderkey").agg(view2.as("attrs"))))
          // equality check once
          if (r == 1) {
            val a = raw.groupBy("l_orderkey").agg(view.as("attrs"))
              .select(col("l_orderkey"), explode(col("attrs")).as(Seq("k", "w")))
            val b = raw.groupBy("l_orderkey").agg(view2.as("attrs"))
              .select(col("l_orderkey"), explode(col("attrs")).as(Seq("k", "w")))
            println(s"[probe] diff rows: ${a.exceptAll(b).count()} + ${b.exceptAll(a).count()}")
          }
        }
      case "post_sort" =>
        val li = Tables.lineitem(spark, d)
        def mathCols = Seq(
          round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("r1"),
          abs(col("l_discount") - 0.05).as("ab"),
          ceil(col("l_quantity")).as("ce"),
          floor(col("l_tax") * 100).as("fl"),
          round(log(col("l_extendedprice")), 6).as("lnp"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(pow(col("l_quantity"), 2), 6).as("pw"),
          pmod(col("l_orderkey"), lit(7L)).as("md"),
          col("l_quantity").cast("decimal(5,1)").as("qdec"))
        val cur = li.select(Seq(col("l_orderkey"), col("l_linenumber")) ++ mathCols: _*)
          .orderBy("l_orderkey", "l_linenumber", "r1", "ab", "ce", "fl", "lnp",
            "sq", "pw", "md", "qdec")
        val post = li.select("l_orderkey", "l_linenumber", "l_extendedprice",
            "l_discount", "l_quantity", "l_tax")
          .orderBy("l_orderkey", "l_linenumber")
          .select(Seq(col("l_orderkey"), col("l_linenumber")) ++ mathCols: _*)
        for (r <- 1 to 3) {
          t(s"fn_math current (rep $r)")(noop(cur))
          t(s"fn_math post-sort (rep $r)")(noop(post))
        }
        println(s"[probe] math diff: ${cur.exceptAll(post).count()} + ${post.exceptAll(cur).count()}")
        val o = Tables.orders(spark, d)
        def vcols(c: org.apache.spark.sql.DataFrame) = c
          .withColumn("v", parse_json(to_json(struct(
            struct(col("o_orderkey").as("k"), col("o_totalprice").as("p")).as("o"),
            array(col("o_orderstatus"), col("o_orderpriority")).as("tags")))))
          .select(
            expr("variant_get(v, '$.o.k', 'bigint')").as("k"),
            expr("variant_get(v, '$.o.p', 'double')").as("p"),
            expr("variant_get(v, '$.tags[0]', 'string')").as("tag0"),
            expr("variant_get(v, '$.tags[1]', 'string')").as("tag1"))
        val vcur = vcols(o).orderBy("k")
        val vpost = vcols(o.select("o_orderkey", "o_totalprice", "o_orderstatus",
            "o_orderpriority").orderBy("o_orderkey"))
        for (r <- 1 to 3) {
          t(s"fn_variant current (rep $r)")(noop(vcur))
          t(s"fn_variant post-sort (rep $r)")(noop(vpost))
        }
      case m =>
        for (q <- m.split(",")) {
          val fn = SparkEntry.queries(q)
          t(s"$q (1st)")(noop(fn(spark, d)))
          t(s"$q (2nd)")(noop(fn(spark, d)))
          t(s"$q (3rd)")(noop(fn(spark, d)))
        }
    }
    spark.stop()
  }
}
