package graft

import java.nio.file.Files

import graft.multimodal.Multimodal.MediaCodec
import graft.table.GraftCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing + catalog/DDL layer. */
class ModuleSpecs extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._
  private val sf = SparkFixture.sf

  // ---- multimodal --------------------------------------------------------

  test("batched feature extraction: fixed dim, deterministic, one row per asset") {
    val df = SparkEntry.queries("q_mm_batch_features")(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(_.getAs[Int]("dim") == 8))
    val again = SparkEntry.queries("q_mm_batch_features")(spark, sf).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getFloat(2), r.getFloat(3), r.getDouble(4))
    assert(rows.map(key).toSeq == again.map(key).toSeq)
  }

  test("decode stub is a pure function of the bytes") {
    val a = MediaCodec.decodeStub("hello world".getBytes)
    assert(a == MediaCodec.decodeStub("hello world".getBytes))
    assert(a.width >= 64 && a.height >= 64 && a.nFrames >= 1)
  }

  test("frame sampling joins back to decode metadata consistently") {
    val meta = SparkEntry.queries("q_mm_decode_meta")(spark, sf)
      .select("doc_id", "n_frames")
    val frames = SparkEntry.queries("q_mm_frame_sample")(spark, sf)
    val joined = frames.groupBy("doc_id").agg(max("frame_idx").as("max_f"))
      .join(meta, "doc_id")
    // every sampled frame index is within the decoded frame count
    assert(joined.filter(col("max_f") >= col("n_frames")).count() == 0)
  }

  // ---- ANN / LSH ---------------------------------------------------------

  test("LSH cosine: every candidate shares ≥1 band with the query; ordering correct") {
    val rows = SparkEntry.queries("q_ext_cosine_lsh")(spark, sf).collect()
    assert(rows.nonEmpty, "probe returned no candidates")
    // banded probe contract: a candidate exists BECAUSE it matched the query
    // on ≥1 of the 4 band signatures (the count is carried in the output)
    val shared = rows.map(_.getAs[Long]("shared_bands"))
    assert(shared.forall(b => b >= 1 && b <= 4), shared.toSeq.toString)
    val sims = rows.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse, "not ordered by similarity desc")
    // band pruning actually pruned: candidates < corpus
    assert(rows.length <= 10)
  }

  test("embed center: hand-computed nano-quantized centroid distance matches bit-for-bit") {
    val rows = SparkEntry.queries("q_ext_embed_center")(spark, sf).collect()
    val raw = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    assert(rows.length == raw.length)
    // replicate the exact contract in scala: floor-nano per element, long
    // sums, integer-div means, left-fold double distance — must be == equal
    val n = raw.length
    val sums = Array.fill(64)(0L)
    for ((_, v) <- raw; i <- 0 until 64)
      sums(i) += math.floor(v(i).toDouble * 1e9).toLong
    val mu = sums.map(s => (s / n).toDouble / 1e9)
    val expect = raw.map { case (id, v) =>
      var acc = 0.0
      for (i <- 0 until 64) {
        val d = v(i).toDouble - mu(i); acc += d * d
      }
      id -> math.sqrt(acc)
    }.toMap
    for (r <- rows)
      assert(r.getDouble(2) == expect(r.getLong(0)),
        s"vec ${r.getLong(0)}: ${r.getDouble(2)} != ${expect(r.getLong(0))}")
    // centered distances of unit vectors stay in (0, 1 + |mu|] ⊂ (0, 2)
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) < 2))
  }

  test("CurationFlow: stage survivors agree with the oracle-verified registry ops") {
    val (packed, counts) = graft.examples.CurationFlow.run(spark, sf)
    val byStage = counts.toMap
    // monotone shrink through the funnel, nothing degenerates to zero
    assert(byStage("raw") >= byStage("deduped"))
    assert(byStage("deduped") >= byStage("quality_gated"))
    assert(byStage("quality_gated") >= byStage("decontaminated"))
    assert(byStage("decontaminated") >= byStage("train") && byStage("train") > 0)
    assert(byStage("packed") == byStage("train"))
    // cross-check stage 3 against the standalone decontamination query:
    // every clean doc must be uncontaminated there too
    val contaminated = SparkEntry.queries("q_ext_contamination")(spark, sf)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val packedIds = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(packedIds.intersect(contaminated).isEmpty,
      "a contaminated doc survived the flow")
    // packing invariant: offsets strictly increase with doc_id, bins monotone
    val rows = packed.collect()
    val offs = rows.map(_.getLong(2))
    assert(offs.zip(offs.tail).forall { case (a, b) => a < b })
    val bins = rows.map(_.getLong(3))
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
  }

  test("kmeans step: every vector assigned, ≤K clusters, partition-invariant") {
    val rows = SparkEntry.queries("q_ext_kmeans")(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    val cids = rows.map(_.getLong(1)).distinct
    assert(cids.length <= 8, s"${cids.length} clusters from K=8 seeds")
    // unit-ish vectors against mean centroids: dot stays well inside (-2, 2)
    assert(rows.forall(r => math.abs(r.getDouble(2)) < 2))
    // integer/argmax arithmetic ⇒ identical under different partitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(SparkEntry.queries("q_ext_kmeans")(spark, sf).collect()
      .map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("power iteration: hand-computed Gram-free rounds match bit-for-bit") {
    val rows = SparkEntry.queries("q_ext_power_iter")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == 64 && rows.map(_._1).toSeq == (0L until 64L))
    // replicate the exact contract: dot against v, floor-nano per
    // contribution, long sums, integer-div — two rounds from v0 = 1/8
    val raw = Tables.embeddings(spark, sf).select("embedding")
      .collect().map(_.getSeq[Float](0))
    val n = raw.length
    def round(v: Array[Double]): Array[Long] = {
      val sums = Array.fill(64)(0L)
      for (x <- raw) {
        var dp = 0.0
        for (i <- 0 until 64) dp += x(i).toDouble * v(i)
        for (i <- 0 until 64)
          sums(i) += math.floor(x(i).toDouble * dp * 1e9).toLong
      }
      sums.map(_ / n)
    }
    val v1 = round(Array.fill(64)(0.125)).map(_.toDouble / 1e9)
    val expect = round(v1)
    for ((dim, got) <- rows)
      assert(got == expect(dim.toInt), s"dim $dim: $got != ${expect(dim.toInt)}")
    assert(rows.exists(_._2 != 0L), "degenerate all-zero direction")
    // exact long arithmetic ⇒ identical under different partitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(SparkEntry.queries("q_ext_power_iter")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq == rows.toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("PQ encode: codes index the codebook, codebook members self-encode at err 0") {
    val rows = SparkEntry.queries("q_ext_pq_encode")(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    // recompute the codebook ids with the same shared seeding contract
    val cb = Tables.embeddings(spark, sf).select("vec_id")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .collect().map(_.getLong(0)).toSet
    assert(cb.size == 16)
    for (r <- rows; s0 <- 1 to 8)
      assert(cb.contains(r.getLong(s0)), s"code outside the codebook")
    // a codebook member's nearest entry in EVERY subspace is itself
    for (r <- rows if cb.contains(r.getLong(0))) {
      assert((1 to 8).forall(s0 => r.getLong(s0) == r.getLong(0)),
        s"codebook vec ${r.getLong(0)} did not self-encode")
      assert(r.getDouble(9) == 0.0, s"codebook vec err ${r.getDouble(9)}")
    }
    assert(rows.forall(_.getDouble(9) >= 0.0))
    // deterministic struct-min tie-break ⇒ identical under repartitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(SparkEntry.queries("q_ext_pq_encode")(spark, sf).collect()
      .map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("IVF-PQ search: cell-local candidates, exact rerank ordered, sane approx") {
    val rows = SparkEntry.queries("q_ext_ivfpq_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_._1 != 0L), "the query returned itself")
    assert(rows.forall(r => r._2 >= 0.0 && r._3 >= 0.0))
    val ex = rows.map(_._3)
    assert(ex.zip(ex.tail).forall { case (a, b) => a <= b }, "not rerank-sorted")
    // the ADC bound is the squared-L2 triangle inequality against the
    // encoder's own reconstruction error: ||q-c||² ≤ 2||q-v||² + 2||v-c||²
    val errs = SparkEntry.queries("q_ext_pq_encode")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(9)).toMap
    for ((id, ap, e) <- rows)
      assert(ap <= 2.0 * e + 2.0 * errs(id) + 1e-6,
        s"vec $id: approx $ap vs exact $e, err ${errs(id)}")
    // deterministic end to end ⇒ identical under repartitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(SparkEntry.queries("q_ext_ivfpq_search")(spark, sf).collect()
      .map(_.toSeq).toSeq == rows.map(r => Seq[Any](r._1, r._2, r._3)).toSeq)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ANN recall eval: exact set matches brute-force top-k, recall consistent") {
    val r = SparkEntry.queries("q_ext_ann_recall")(spark, sf).collect().head
    val (nEx, nIv, nOv, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nEx == 10, s"exact top-k must find 10 neighbors, got $nEx")
    assert(nOv <= math.min(nEx, nIv))
    assert(recall == nOv.toDouble / nEx)
    // the 1-probe IVF path trades recall for compute; it must return
    // SOMETHING from the query's cell but cannot beat the exact baseline
    assert(nIv >= 1 && recall >= 0.0 && recall <= 1.0)
  }

  test("ANN recall: probing 2 cells never loses to probing 1") {
    val r1 = SparkEntry.queries("q_ext_ann_recall")(spark, sf).collect().head
    val r2 = SparkEntry.queries("q_ext_ann_recall_probe2")(spark, sf).collect().head
    // the probe-2 candidate set is a superset of probe-1's, so its top-10
    // can only gain true neighbors
    assert(r2.getDouble(3) >= r1.getDouble(3),
      s"probe2 recall ${r2.getDouble(3)} < probe1 ${r1.getDouble(3)}")
    assert(r2.getLong(1) >= r1.getLong(1))
  }

  // ---- catalog / DDL -----------------------------------------------------

  test("catalog: create/alter/show/drop with Paimon-style options") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    val t = cat.createTable("default", "measurements", Map(
      "bucket" -> "2", "bucket-key" -> "sensor_id", "file.format" -> "parquet"))
    assert(cat.listDatabases() == Seq("default"))
    assert(cat.listTables("default") == Seq("measurements"))
    t.appendBatch(Seq((1L, 10.5), (2L, 11.5)).toDF("sensor_id", "reading"), 0)
    assert(cat.getTable("default", "measurements").read.count() == 2)

    cat.alterTable("default", "measurements", Map(
      "snapshot.time-retained" -> "20 s", "snapshot.num-retained.max" -> "5"))
    assert(cat.tableOptions("default", "measurements")("snapshot.time-retained") == "20 s")

    intercept[IllegalArgumentException](
      cat.createTable("default", "measurements", Map.empty))
    cat.dropTable("default", "measurements")
    assert(cat.listTables("default").isEmpty)
  }

  test("catalog: PK table honors primary-key/sequence.field options") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    val t = cat.createTable("default", "sensor_info", Map(
      "primary-key" -> "sensor_id", "sequence.field" -> "updated_at",
      "changelog-producer" -> "input"))
    t.appendBatch(Seq((1L, 100L, "x")).toDF("sensor_id", "updated_at", "v"), 0)
    t.appendBatch(Seq((1L, 200L, "y")).toDF("sensor_id", "updated_at", "v"), 1)
    val got = cat.getTable("default", "sensor_info").read.collect()
    assert(got.length == 1 && got.head.getString(2) == "y")
  }

  test("catalog: retention + auto-compaction policies from options") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    val t = cat.createTable("default", "m2", Map(
      "bucket" -> "1",
      "compaction.max.file-num" -> "3",
      "snapshot.num-retained.min" -> "1", "snapshot.num-retained.max" -> "1",
      "snapshot.time-retained" -> "1 ms"))
    for (b <- 0 until 5) t.appendBatch(Seq((b.toLong, b.toString)).toDF("id", "v"), b)
    assert(cat.maybeCompact("default", "m2"), "compaction should be due (>3 files)")
    val after = cat.getTable("default", "m2")
    assert(after.latestSnapshot.get.files.size == 1)
    assert(after.read.count() == 5)
    assert(cat.applyRetention("default", "m2") > 0)
    assert(cat.getTable("default", "m2").read.count() == 5)
  }

  test("catalog: auto-maintenance materializes pending deletion vectors") {
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    val t = cat.createTable("default", "mdv", Map(
      "compaction.max.file-num" -> "10")) // file-count trigger NOT due
    t.appendBatch((0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), 0L)
    t.appendBatch((50L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), 1L)
    assert(t.deleteWhere(col("id") === 7L) == 1L) // deletion vector
    // the policy runs the SURGICAL materialization instead of a compaction
    assert(cat.maybeCompact("default", "mdv"), "dv materialization is due")
    val after = cat.getTable("default", "mdv")
    assert(after.latestSnapshot.get.files.forall(_.dvCount.forall(_ == 0L)))
    assert(after.latestSnapshot.get.files.size == 2, "no full compaction ran")
    assert(after.read.count() == 99)
    // clean table: nothing due
    assert(!cat.maybeCompact("default", "mdv"))
  }

  test("catalog: sort-compact.columns option z-orders the auto-compaction") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    val t = cat.createTable("default", "m4", Map(
      "bucket" -> "4",
      "compaction.max.file-num" -> "2",
      "sort-compact.columns" -> "x, y"))
    // hash-scrambled appends: neither column clusters in the raw layout
    val rows = (0L until 4096L).map { i =>
      val h = i * 2654435761L % 4096L
      (h, (h % 64L) * 1.0, (h / 64L) * 1.0)
    }
    rows.grouped(1024).zipWithIndex.foreach { case (g, b) =>
      t.appendBatch(g.toDF("id", "x", "y"), b.toLong)
    }
    assert(cat.maybeCompact("default", "m4"), "compaction due (>2 files)")
    val after = cat.getTable("default", "m4")
    assert(after.read.count() == 4096)
    // the rewrite clustered BOTH dims: a narrow y band prunes files even
    // though y would be the "trailing" column of any linear sort
    after.readWhere("y", 2.0, 9.0)
    val (kept, total) = after.lastSkip.get
    assert(total == 4, s"expected the 4-bucket rewrite, saw $total files")
    assert(kept < total, s"z-ordered compaction must prune: read $kept/$total")

    // a malformed option (one column) fails loudly, not as a silent compact
    cat.createTable("default", "m5", Map(
      "compaction.max.file-num" -> "0", "sort-compact.columns" -> "x"))
    cat.getTable("default", "m5").appendBatch(Seq((1L, 1.0)).toDF("id", "x"), 0)
    intercept[IllegalArgumentException] { cat.maybeCompact("default", "m5") }
  }

  test("writeStreamManaged: auto-compaction knobs act on the streaming path") {
    // the tutorial sets full-compaction.delta-commits / file-num knobs via
    // ALTER TABLE and expects maintenance to happen as ingestion runs
    // (guide.md:265-271) — no manual compact() call anywhere here
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    cat.createTable("default", "m3", Map(
      "bucket" -> "1", "compaction.max.file-num" -> "2"))
    val srcDir = Files.createTempDirectory("graft_mng_src_").toString
    val src = spark.range(0, 50).toDF("id")
    for (i <- 0 until 4) {
      src.filter(col("id") % 4 === i).write.mode("append").parquet(srcDir)
      val q = cat.writeStreamManaged("default", "m3",
        spark.readStream.schema(src.schema).parquet(srcDir),
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    val t = cat.getTable("default", "m3")
    assert(t.read.count() == 50, "every micro-batch committed exactly once")
    assert(t.latestSnapshot.get.files.size <= 3,
      s"auto-compaction kept the file count bounded: ${t.latestSnapshot.get.files.size}")
  }

  test("writeStreamManaged: a declared partition.expiration-time ages out " +
      "old partitions at COMMIT time — zero manual procedure calls") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft_wh_").toString)
    cat.createTable("default", "pexp", Map(
      "partition-keys" -> "dt",
      "partition.expiration-strategy" -> "values-time",
      "partition.expiration-time" -> "3650 d"))
    val srcDir = Files.createTempDirectory("graft_pexp_src_").toString
    import spark.implicits._
    // batch 1: one dead-past and one future partition
    Seq((1L, "2000-01-01"), (2L, "2099-12-31")).toDF("id", "dt")
      .write.mode("append").parquet(srcDir)
    def drain(): Unit = {
      val q = cat.writeStreamManaged("default", "pexp",
        spark.readStream.schema("id BIGINT, dt STRING").parquet(srcDir),
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    drain()
    val t = cat.getTable("default", "pexp")
    assert(t.read.select("id").as[Long].collect().toSeq == Seq(2L),
      "the dead-past partition must age out as part of the commit itself")
    // batch 2: another dead partition arrives mid-stream — next trigger
    // expires it too, still without any CALL
    Seq((3L, "2001-06-15"), (4L, "2098-01-01")).toDF("id", "dt")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(t.read.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L),
      t.read.collect().mkString(", "))
  }

  test("session catalog introspection (SHOW DATABASES/FUNCTIONS, 2A#13)") {
    assert(spark.sql("SHOW DATABASES").count() >= 1)
    assert(spark.sql("SHOW FUNCTIONS").count() > 300)
    assert(spark.catalog.functionExists("sum"))
  }

  test("streaming restart on the same checkpoint reprocesses nothing (exactly-once)") {
    val t = new graft.table.StreamTable(
      Files.createTempDirectory("graft_restart_").toString, spark)
    val srcDir = Files.createTempDirectory("graft_restart_src_").toString
    val src = spark.range(0, 100).toDF("id")
    src.write.parquet(s"$srcDir/in")
    def runOnce(): Unit = {
      val q = t.writeStream(
        spark.readStream.schema(src.schema).parquet(s"$srcDir/in"),
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    runOnce()
    assert(t.read.count() == 100)
    runOnce() // same checkpoint: source offsets already committed
    assert(t.read.count() == 100, "restart must not duplicate rows")
  }

  test("offline CompactJob entry point compacts and conserves rows (2A#16)") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_cjob_").toString
    val t = new graft.table.StreamTable(dir, spark)
    for (b <- 0 until 6)
      t.appendBatch(spark.range(b * 10, b * 10 + 10).coalesce(1).select(col("id")), b)
    assert(t.latestSnapshot.get.files.size == 6)
    graft.table.CompactJob.main(Array(dir, "2"))
    val after = new graft.table.StreamTable(dir, spark)
    assert(after.latestSnapshot.get.files.size == 2)
    assert(after.read.count() == 60)
    assert(!spark.sparkContext.isStopped, "job must not stop a shared session")

    // --zorder mode: same conservation, clustered layout (sort-compact)
    val zdir = Files.createTempDirectory("graft_cjobz_").toString
    val tz = new graft.table.StreamTable(zdir, spark)
    for (b <- 0 until 4)
      tz.appendBatch(spark.range(b * 25, b * 25 + 25)
        .select(col("id"), (col("id") % 5).cast("double").as("x"),
          (col("id") / 20).cast("double").as("y")), b)
    graft.table.CompactJob.main(Array(zdir, "4", "--zorder", "x,y"))
    val az = new graft.table.StreamTable(zdir, spark)
    assert(az.latestSnapshot.get.files.size == 4)
    assert(az.read.count() == 100)
    intercept[IllegalArgumentException] {
      graft.table.CompactJob.main(Array(zdir, "4", "--zorder", "x"))
    }
  }

  test("duration parsing matches the reference's SET syntax") {
    import graft.table.GraftCatalog.parseDurationMs
    assert(parseDurationMs("20 s") == 20000L)
    assert(parseDurationMs("30 min") == 1800000L)
    assert(parseDurationMs("1 h") == 3600000L)
  }
}
