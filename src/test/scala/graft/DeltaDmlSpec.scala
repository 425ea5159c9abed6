package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.table.StreamTable

/** Delta-based (merge-on-read) row-level DML — `rowlevel.mode = dv`
  * (sources/v2/V2RowLevel.scala, GraftDeltaOperation): UPDATE/MERGE/DELETE
  * commit deletion vectors + appended images instead of rewriting files,
  * cost ∝ matches. Pins the no-rewrite property, the raw `_graft_pos`
  * row-id coordinate, the full-file-delete edge, and the COW scan's
  * suppression of PRE-EXISTING vectors (a dv'd row must never resurrect
  * through a later copy-on-write UPDATE). */
class DeltaDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def freshCatalog(tag: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"v2_${tag}_wh_").toString
    val catName = s"graft_${tag}_${Integer.toHexString(wh.hashCode).take(6)}"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.sources.v2.GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse", wh)
    (catName, wh)
  }

  private def fileState(root: String): Seq[(String, Long, Any)] = {
    val t = graft.table.GraftCatalog.openPath(spark, root)
    t.latestSnapshot.get.files.map(f => (f.path, f.fileSizeInBytes,
      java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f.path))))
      .sortBy(_._1)
  }

  test("dv-mode UPDATE commits vectors + images, rewrites zero data bytes") {
    val (cat, wh) = freshCatalog("dvu")
    spark.sql(s"CREATE TABLE $cat.d.t (id BIGINT, v STRING, x DOUBLE) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.t " +
      "SELECT id, concat('r', id), id * 1.5 FROM range(0, 1000)")
    val root = s"$wh/d.db/t"
    val before = fileState(root)

    spark.sql(s"UPDATE $cat.d.t SET x = -1.0, v = 'upd' WHERE id % 100 = 7")

    // every pre-update data file survives verbatim; matches became vectors
    val t = graft.table.GraftCatalog.openPath(spark, root)
    val after = t.latestSnapshot.get.files
    val beforePaths = before.map(_._1).toSet
    assert(after.filter(f => beforePaths(f.path))
      .map(f => (f.path, f.fileSizeInBytes,
        java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f.path))))
      .sortBy(_._1) == before, "dv-mode UPDATE must not rewrite data files")
    assert(after.map(_.dvCount.getOrElse(0L)).sum == 10L, after.toString)
    val inserted = after.filterNot(f => beforePaths(f.path))
    assert(inserted.nonEmpty && inserted.map(_.rowCount).sum == 10L,
      inserted.toString)
    assert(inserted.forall(_.level == 1),
      "updated images are maintenance output, not streamed inserts")

    // result correctness through SQL
    val got = spark.sql(s"SELECT id, v, x FROM $cat.d.t ORDER BY id").collect()
    assert(got.length == 1000)
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 100 == 7) assert(r.getString(1) == "upd" && r.getDouble(2) == -1.0, r.toString)
      else assert(r.getString(1) == s"r$id" && r.getDouble(2) == id * 1.5, r.toString)
    }
    // pre-update version intact (snapshot 0 = the INSERT)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.t VERSION AS OF 0 " +
      "WHERE v = 'upd'").head().getLong(0) == 0L)
    // a second UPDATE merges into existing vectors
    spark.sql(s"UPDATE $cat.d.t SET v = 'upd2' WHERE id % 100 = 13")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.t WHERE v = 'upd2'")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.t").head().getLong(0) == 1000L)
  }

  test("dv-mode MERGE: matched DELETE + matched UPDATE + not-matched INSERT") {
    val (cat, wh) = freshCatalog("dvm")
    spark.sql(s"CREATE TABLE $cat.d.m (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.m SELECT id, id * 10.0 FROM range(0, 500)")
    val root = s"$wh/d.db/m"
    val before = fileState(root)
    spark.sql(
      s"""MERGE INTO $cat.d.m t
         |USING (SELECT id * 5 AS k FROM range(0, 120)) s
         |ON t.id = s.k
         |WHEN MATCHED AND t.id % 10 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET bal = 0.0
         |WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.k, -1.0)
         |""".stripMargin)
    // ids 0..495 step 5 matched (100): the 50 with %10==0 deleted, the
    // other 50 zeroed; ids 500..595 step 5 (20) inserted at -1.0
    val got = spark.sql(s"SELECT id, bal FROM $cat.d.m ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 500 - 50 + 20, got.length.toString)
    assert(!got.exists(e => e._1 % 10 == 0 && e._1 < 500),
      "matched DELETE rows must be gone")
    assert(got.filter(e => e._1 % 5 == 0 && e._1 < 500).forall(_._2 == 0.0))
    assert(got.filter(_._1 >= 500).map(_._1).toSeq ==
      (500L until 600L by 5).toSeq)
    assert(got.filter(_._1 >= 500).forall(_._2 == -1.0))
    assert(got.filter(e => e._1 % 5 != 0).forall(e => e._2 == e._1 * 10.0))
    // no pre-merge data file was rewritten
    val t = graft.table.GraftCatalog.openPath(spark, root)
    val beforePaths = before.map(_._1).toSet
    assert(t.latestSnapshot.get.files.filter(f => beforePaths(f.path))
      .map(f => (f.path, f.fileSizeInBytes,
        java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f.path))))
      .sortBy(_._1) == before, "dv-mode MERGE must not rewrite data files")
  }

  test("dv-mode full-file delete drops the file from the live set") {
    val (cat, wh) = freshCatalog("dvf")
    spark.sql(s"CREATE TABLE $cat.d.f (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    // two single-file commits with disjoint key ranges
    spark.sql(s"INSERT INTO $cat.d.f " +
      "SELECT id, 'a' FROM range(0, 50) ORDER BY id LIMIT 50")
    spark.sql(s"INSERT INTO $cat.d.f " +
      "SELECT id, 'b' FROM range(50, 100) ORDER BY id LIMIT 50")
    val root = s"$wh/d.db/f"
    val t0 = graft.table.GraftCatalog.openPath(spark, root)
    val liveBefore = t0.latestSnapshot.get.files.map(_.path).toSet
    // MERGE-DELETE every row of the second commit's file(s) — routed
    // through the delta op (MERGE is never metadata-pushable)
    spark.sql(
      s"""MERGE INTO $cat.d.f t USING (SELECT id AS k FROM range(50, 100)) s
         |ON t.id = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val t1 = graft.table.GraftCatalog.openPath(spark, root)
    val after = t1.latestSnapshot.get.files
    assert(after.map(_.path).toSet.subsetOf(liveBefore))
    assert(after.map(_.rowCount).sum == 50L)
    assert(after.forall(_.dvCount.forall(_ == 0L)),
      "a fully-deleted file must DROP, not carry a full vector")
    assert(spark.sql(s"SELECT count(*), max(id) FROM $cat.d.f").head()
      == org.apache.spark.sql.Row(50L, 49L))
    // the dropped file's rows remain time-travelable (snapshot 1 = the
    // second INSERT, the last pre-merge version)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.f VERSION AS OF 1")
      .head().getLong(0) == 100L)
  }

  test("COW row-level scan suppresses pending deletion vectors") {
    import org.apache.spark.sql.functions.col
    val (cat, wh) = freshCatalog("dvc")
    // default rowlevel.mode = cow
    spark.sql(s"CREATE TABLE $cat.d.c (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.d.c SELECT id, 'x' FROM range(0, 100)")
    val root = s"$wh/d.db/c"
    val t = graft.table.GraftCatalog.openPath(spark, root)
    // a DV delete leaves a pending vector on the file
    assert(t.deleteWhere(col("id") === 42L) == 1L)
    assert(t.latestSnapshot.get.files.exists(_.dvCount.contains(1L)))
    // the copy-on-write UPDATE must NOT resurrect id=42: its scan reads the
    // touched file WITHOUT the dv'd row, and the conservation check holds
    spark.sql(s"UPDATE $cat.d.c SET v = 'y' WHERE id >= 40 AND id <= 44")
    val got = spark.sql(s"SELECT id FROM $cat.d.c WHERE id BETWEEN 40 AND 44 " +
      "ORDER BY id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(40L, 41L, 43L, 44L), got.toString)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.c WHERE v = 'y'")
      .head().getLong(0) == 4L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.c").head().getLong(0) == 99L)
    // the rewrite materialized the touched file's vector
    val t2 = graft.table.GraftCatalog.openPath(spark, root)
    assert(t2.latestSnapshot.get.files.forall(_.dvCount.forall(_ == 0L)),
      "COW over a dv'd file must materialize its vector")
  }

  test("_graft_pos is the raw offset: stable under filters and vectors") {
    import org.apache.spark.sql.functions.col
    val (cat, wh) = freshCatalog("dvp")
    spark.sql(s"CREATE TABLE $cat.d.p (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.p SELECT id, 'x' FROM range(0, 100)")
    // positions under a pushed filter match positions from a full scan
    // (parquet record skipping is disabled when _graft_pos is requested)
    val full = spark.sql(s"SELECT id, _graft_file, _graft_pos FROM $cat.d.p")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val filtered = spark.sql(s"SELECT id, _graft_file, _graft_pos " +
      s"FROM $cat.d.p WHERE id >= 90").collect()
    assert(filtered.length == 10)
    filtered.foreach(r =>
      assert(full(r.getLong(0)) == (r.getString(1), r.getLong(2)), r.toString))
    // after a delta DELETE, surviving rows keep their RAW positions
    spark.sql(
      s"""MERGE INTO $cat.d.p t USING (SELECT 95 AS k) s ON t.id = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val after = spark.sql(s"SELECT id, _graft_file, _graft_pos " +
      s"FROM $cat.d.p WHERE id >= 90").collect()
    assert(after.length == 9)
    after.foreach(r =>
      assert(full(r.getLong(0)) == (r.getString(1), r.getLong(2)), r.toString))
    val root = s"$wh/d.db/p"
    assert(graft.table.GraftCatalog.openPath(spark, root)
      .latestSnapshot.get.files.map(_.dvCount.getOrElse(0L)).sum == 1L)
  }

  test("dv'd files decode COLUMNAR with batch-level suppression") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("v2_dvcol_").toString
    val tbl = new StreamTable(root, spark)
    // one 10k-row file: deletions at batch edges (4096-row batches), plus a
    // clean second file that must stay on the zero-copy reader
    tbl.appendBatch(spark.range(0, 10000).toDF("id")
      .withColumn("s", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("r"), col("id")))
      .coalesce(1).sortWithinPartitions("id"), 0L)
    tbl.appendBatch(spark.range(10000, 12000).toDF("id")
      .withColumn("s", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("r"), col("id")))
      .coalesce(1).sortWithinPartitions("id"), 1L)
    val gone = Seq(0L, 4095L, 4096L, 5000L, 9999L)
    assert(tbl.deleteWhere(col("id").isin(gone: _*)) == gone.length.toLong)

    val v2 = spark.read.format("graft").load(root)
    // the scan plans COLUMNAR despite the vector
    val scan = v2.select("id", "s").queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.get.asInstanceOf[graft.sources.v2.GraftScan]
    val f = scan.createReaderFactory()
    assert(scan.planInputPartitions().forall(f.supportColumnarReads),
      "dv'd files must not demote the scan off the columnar path")
    // exact suppression across batch boundaries
    assert(v2.count() == 12000L - gone.length)
    assert(v2.where(col("id").isin(gone: _*)).count() == 0L)
    val edge = v2.where(col("id").between(4090L, 4100L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(edge == (4090L to 4100L).filterNot(Set(4095L, 4096L)).toSeq, edge)
    // string column survives the survivor compaction
    assert(v2.where(col("id") === 5001L).select("s").head().getString(0) == "r5001")
    // pushed LIMIT trims AFTER suppression
    assert(v2.limit(11996).count() == 11995L ||
      v2.limit(11995).count() == 11995L)
    assert(v2.limit(100).where(col("id").isin(gone: _*)).count() == 0L)
    StreamTable.deleteTree(java.nio.file.Paths.get(root))
  }

  test("non-pushable DELETE routes through the delta door as vectors") {
    val (cat, wh) = freshCatalog("dvd")
    spark.sql(s"CREATE TABLE $cat.d.d (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.d SELECT id, concat('r', id) FROM range(0, 300)")
    val root = s"$wh/d.db/d"
    val before = fileState(root)
    // id % 97 = 3 is not a translatable source filter, so the DELETE cannot
    // take the metadata push (deleteWhere) — it plans as a row-level op,
    // which in dv mode commits vectors with ZERO staged inserts
    spark.sql(s"DELETE FROM $cat.d.d WHERE id % 97 = 3")
    val t = graft.table.GraftCatalog.openPath(spark, root)
    val after = t.latestSnapshot.get.files
    assert(after.map(f => (f.path, f.fileSizeInBytes,
      java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f.path))))
      .sortBy(_._1) == before, "a delta DELETE must not rewrite data files")
    assert(after.map(_.dvCount.getOrElse(0L)).sum == 4L) // 3,100,197,294
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.d").head().getLong(0) == 296L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.d WHERE id % 97 = 3")
      .head().getLong(0) == 0L)
  }

  test("DV backlog guard: past graft.dv.max-backlog the next DML falls back to COW") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("v2_dvbk_").toString
    val t = new StreamTable(root, spark)
    t.appendBatch((0L until 100L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1), 0L)
    sys.props("graft.dv.max-backlog") = "5"
    try {
      // plant a 6-position backlog through the DV fast path (under the
      // bound at statement time: 0 then 3 accumulated positions)
      assert(t.deleteWhere(col("id").isin(1L, 2L, 3L)) == 3L)
      assert(t.deleteWhere(col("id").isin(4L, 5L, 6L)) == 3L)
      val planted = t.latestSnapshot.get.files
      assert(planted.map(_.dvCount.getOrElse(0L)).sum == 6L,
        "the planted statements must have taken the DV route")
      val pathsBefore = planted.map(_.path).toSet
      // backlog (6) > bound (5): the guard fires and this DML lands as a
      // copy-on-write rewrite — the touched file is REPLACED (vectors
      // materialized away), not given a seventh vector position
      assert(t.deleteWhere(col("id") === 7L) == 1L)
      val after = t.latestSnapshot.get.files
      assert(after.map(_.dvCount.getOrElse(0L)).sum == 0L,
        s"COW fallback must not grow the vector backlog: $after")
      assert(after.map(_.path).toSet.intersect(pathsBefore).isEmpty,
        "the COW rewrite replaces the backlogged file")
      assert(t.read.count() == 93L)
      assert(t.read.filter(col("id") <= 7L).count() == 1L,
        "only id=0 survives in [0,7] — prior DV deletes must not resurrect")
    } finally sys.props.remove("graft.dv.max-backlog")
    StreamTable.deleteTree(java.nio.file.Paths.get(root))
  }

  test("commitDeltaDml refuses when the touched file is no longer live") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("v2_dvg_").toString
    val tbl = new StreamTable(root, spark)
    tbl.appendBatch((0L until 50L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1), 0L)
    val stale = tbl.latestSnapshot.get.files.head.path
    tbl.compact(targetFileCount = 1) // rewrites: the old path leaves the live set
    val e = intercept[IllegalStateException] {
      tbl.commitDeltaDml(Map(stale -> Array(0L)), Seq.empty, "DELETE")
    }
    assert(e.getMessage.contains("no longer live"), e.getMessage)
    StreamTable.deleteTree(java.nio.file.Paths.get(root))
  }

  test("PK table SQL UPDATE: merge-on-read image append, no file rewritten") {
    val (cat, wh) = freshCatalog("pku")
    spark.sql(s"CREATE TABLE $cat.d.u (id BIGINT, v STRING, bal DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='4')")
    spark.sql(s"INSERT INTO $cat.d.u " +
      "SELECT id, concat('r', id), id * 1.0 FROM range(0, 200)")
    val root = s"$wh/d.db/u"
    val before = fileState(root)
    spark.sql(s"UPDATE $cat.d.u SET bal = bal + 1000 WHERE id % 10 = 3")
    // every pre-update file survives verbatim (images re-appended, LWW wins)
    val t = graft.table.GraftCatalog.openPath(spark, root)
    val after = t.latestSnapshot.get.files
    val beforePaths = before.map(_._1).toSet
    assert(after.filter(f => beforePaths(f.path))
      .map(f => (f.path, f.fileSizeInBytes,
        java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(f.path))))
      .sortBy(_._1) == before, "PK UPDATE must not rewrite data files")
    val got = spark.sql(s"SELECT id, v, bal FROM $cat.d.u ORDER BY id").collect()
    assert(got.length == 200)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"r$id")
      assert(r.getDouble(2) == (if (id % 10 == 3) id + 1000.0 else id * 1.0), r.toString)
    }
    // a key-reassigning UPDATE tombstones the old key
    spark.sql(s"UPDATE $cat.d.u SET id = id + 500 WHERE id = 7")
    val moved = spark.sql(s"SELECT id, v FROM $cat.d.u WHERE id IN (7, 507)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(moved == Seq((507L, "r7")), moved.toString)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.u").head().getLong(0) == 200L)
  }

  test("PK table SQL MERGE: matched UPDATE/DELETE + not-matched INSERT") {
    val (cat, wh) = freshCatalog("pkm")
    spark.sql(s"CREATE TABLE $cat.d.m (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='4')")
    spark.sql(s"INSERT INTO $cat.d.m SELECT id, id * 10.0 FROM range(0, 100)")
    spark.sql(
      s"""MERGE INTO $cat.d.m t
         |USING (SELECT id * 2 AS k FROM range(0, 70)) s
         |ON t.id = s.k
         |WHEN MATCHED AND t.id % 10 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET bal = -t.bal
         |WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.k, 0.5)
         |""".stripMargin)
    // evens 0..98 matched: 0,10,...,90 deleted (10), other 40 negated;
    // 100..138 step 2 (20) inserted at 0.5; odds untouched (50)
    val got = spark.sql(s"SELECT id, bal FROM $cat.d.m ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 100 - 10 + 20, got.length.toString)
    assert(!got.exists(e => e._1 % 10 == 0 && e._1 < 100), "deletes must land")
    assert(got.filter(e => e._1 % 2 == 0 && e._1 < 100).forall(e => e._2 == -(e._1 * 10.0)))
    assert(got.filter(_._1 >= 100).map(_._1).toSeq == (100L until 140L by 2).toSeq)
    assert(got.filter(_._1 % 2 == 1).forall(e => e._2 == e._1 * 10.0))
    // no data file was rewritten: PK DML is pure append
    val t = graft.table.GraftCatalog.openPath(spark, s"$wh/d.db/m")
    assert(t.latestSnapshot.get.files.forall(_.rowCount > 0))
  }

  test("PK table with sequence.field: DML tombstones carry the live sequence") {
    val (cat, wh) = freshCatalog("pks")
    spark.sql(s"CREATE TABLE $cat.d.s (id BIGINT, ver BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='2', " +
      "'sequence.field'='ver')")
    // two versions of each key: ver=2 wins the LWW view
    spark.sql(s"INSERT INTO $cat.d.s SELECT id, 1, concat('a', id) FROM range(0, 30)")
    spark.sql(s"INSERT INTO $cat.d.s SELECT id, 2, concat('b', id) FROM range(0, 30)")
    assert(spark.sql(s"SELECT v FROM $cat.d.s WHERE id = 3").head().getString(0) == "b3")
    // non-pushable DELETE routes through the PK delta op; its tombstone must
    // carry ver=2 (the LIVE sequence) to actually kill the resolved row
    spark.sql(s"DELETE FROM $cat.d.s WHERE id % 10 = 3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.s").head().getLong(0) == 27L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.s WHERE id % 10 = 3")
      .head().getLong(0) == 0L)
    // a LATER higher-sequence arrival still beats the tombstone (the
    // delete-current contract: delete what is there now, not the future)
    spark.sql(s"INSERT INTO $cat.d.s VALUES (3, 9, 'c3')")
    assert(spark.sql(s"SELECT v FROM $cat.d.s WHERE id = 3").head().getString(0) == "c3")
    // UPDATE keeps the image's sequence; the later batch breaks the tie
    spark.sql(s"UPDATE $cat.d.s SET v = 'upd' WHERE id = 4")
    assert(spark.sql(s"SELECT v, ver FROM $cat.d.s WHERE id = 4").head()
      == org.apache.spark.sql.Row("upd", 2L))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE works through both delta doors") {
    // PK table: unmatched-by-source rows update/delete as images/tombstones
    val (cat, _) = freshCatalog("nms")
    spark.sql(s"CREATE TABLE $cat.d.n (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='2')")
    spark.sql(s"INSERT INTO $cat.d.n SELECT id, id * 1.0 FROM range(0, 40)")
    spark.sql(
      s"""MERGE INTO $cat.d.n t USING (SELECT id * 4 AS k FROM range(0, 10)) s
         |ON t.id = s.k
         |WHEN MATCHED THEN UPDATE SET bal = 100.0
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 38 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = -9.0
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, bal FROM $cat.d.n ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 38, got.length.toString) // 38,39 deleted
    assert(got.filter(_._1 % 4 == 0).forall(_._2 == 100.0))
    assert(got.filter(e => e._1 % 4 != 0).forall(_._2 == -9.0))
    // append table in dv mode: the same statement via vectors
    spark.sql(s"CREATE TABLE $cat.d.na (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.na SELECT id, id * 1.0 FROM range(0, 40)")
    spark.sql(
      s"""MERGE INTO $cat.d.na t USING (SELECT id * 4 AS k FROM range(0, 10)) s
         |ON t.id = s.k
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 38 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = -9.0
         |""".stripMargin)
    val ga = spark.sql(s"SELECT id, bal FROM $cat.d.na ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ga.length == 38)
    assert(ga.filter(_._1 % 4 == 0).forall(e => e._2 == e._1 * 1.0))
    assert(ga.filter(e => e._1 % 4 != 0).forall(_._2 == -9.0))
  }

  test("DML through renamed columns: declared names in, file names persisted") {
    val (cat, _) = freshCatalog("dvrn")
    spark.sql(s"CREATE TABLE $cat.d.rn (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.rn SELECT id, concat('r', id) FROM range(0, 50)")
    spark.sql(s"ALTER TABLE $cat.d.rn RENAME COLUMN v TO label")
    spark.sql(s"UPDATE $cat.d.rn SET label = 'x' WHERE id = 7")
    assert(spark.sql(s"SELECT label FROM $cat.d.rn WHERE id = 7")
      .head().getString(0) == "x")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.rn").head().getLong(0) == 50L)
    // PK table: rename then UPDATE + DELETE through the delta door
    spark.sql(s"CREATE TABLE $cat.d.rp (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='2')")
    spark.sql(s"INSERT INTO $cat.d.rp SELECT id, concat('r', id) FROM range(0, 50)")
    spark.sql(s"ALTER TABLE $cat.d.rp RENAME COLUMN v TO label")
    spark.sql(s"UPDATE $cat.d.rp SET label = 'y' WHERE id = 9")
    spark.sql(s"DELETE FROM $cat.d.rp WHERE id % 25 = 3")
    assert(spark.sql(s"SELECT label FROM $cat.d.rp WHERE id = 9")
      .head().getString(0) == "y")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.rp").head().getLong(0) == 48L)
  }

  test("DML after ADD COLUMN: images carry the new column, old files null-fill") {
    val (cat, _) = freshCatalog("dvev")
    // append table in dv mode
    spark.sql(s"CREATE TABLE $cat.d.e (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.e SELECT id, concat('r', id) FROM range(0, 60)")
    spark.sql(s"ALTER TABLE $cat.d.e ADD COLUMNS (score DOUBLE)")
    // the UPDATE's images are written post-evolution and carry score;
    // untouched rows come from pre-evolution files and null-fill
    spark.sql(s"UPDATE $cat.d.e SET score = 1.5, v = 'up' WHERE id % 30 = 7")
    val got = spark.sql(s"SELECT id, v, score FROM $cat.d.e ORDER BY id").collect()
    assert(got.length == 60)
    got.foreach { r =>
      if (r.getLong(0) % 30 == 7)
        assert(r.getString(1) == "up" && r.getDouble(2) == 1.5, r.toString)
      else assert(r.getString(1) == s"r${r.getLong(0)}" && r.isNullAt(2), r.toString)
    }
    // PK table: same evolution then UPDATE + MERGE-delete through the
    // merge-on-read door (images mix post-evolution width with
    // pre-evolution files inside one bucket's LWW resolve)
    spark.sql(s"CREATE TABLE $cat.d.pe (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='2')")
    spark.sql(s"INSERT INTO $cat.d.pe SELECT id, concat('r', id) FROM range(0, 60)")
    spark.sql(s"ALTER TABLE $cat.d.pe ADD COLUMNS (score DOUBLE)")
    spark.sql(s"UPDATE $cat.d.pe SET score = 2.5 WHERE id = 11")
    spark.sql(
      s"""MERGE INTO $cat.d.pe t USING (SELECT 12 AS k) s ON t.id = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT v, score FROM $cat.d.pe WHERE id = 11").head()
      == org.apache.spark.sql.Row("r11", 2.5))
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.pe").head().getLong(0) == 59L)
    assert(spark.sql(s"SELECT count(score) FROM $cat.d.pe").head().getLong(0) == 1L)
  }

  test("auto-maintenance materializes dv-mode DML vectors") {
    val (cat, wh) = freshCatalog("dvam")
    spark.sql(s"CREATE TABLE $cat.d.am (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.am SELECT id, concat('r', id) FROM range(0, 100)")
    spark.sql(s"UPDATE $cat.d.am SET v = 'upd' WHERE id % 20 = 1")
    val gc = new graft.table.GraftCatalog(spark, wh)
    assert(gc.getTable("d", "am").latestSnapshot.get.files
      .exists(_.dvCount.exists(_ > 0)), "the update must land as vectors")
    // the maintenance policy hook sees pending vectors and materializes
    // them surgically (no full compaction needed)
    assert(gc.maybeCompact("d", "am"))
    val after = gc.getTable("d", "am").latestSnapshot.get.files
    assert(after.forall(_.dvCount.forall(_ == 0L)), "vectors must be gone")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.am WHERE v = 'upd'")
      .head().getLong(0) == 5L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.am").head().getLong(0) == 100L)
  }

  test("PK table SQL DML streams: the changelog observes -U/+U and -D") {
    import org.apache.spark.sql.streaming.Trigger
    val (cat, wh) = freshCatalog("pkc")
    spark.sql(s"CREATE TABLE $cat.d.c (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='id', 'bucket'='2', " +
      "'changelog-producer'='input')")
    spark.sql(s"INSERT INTO $cat.d.c SELECT id, id * 1.0 FROM range(0, 20)")
    spark.sql(s"UPDATE $cat.d.c SET bal = -1.0 WHERE id = 5")
    spark.sql(s"DELETE FROM $cat.d.c WHERE id = 7")
    val root = s"$wh/d.db/c"
    val chk = java.nio.file.Files.createTempDirectory("pkc_chk_").toString
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.Row]())
    val q = spark.readStream.format("graft").option("read-changelog", "true")
      .load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.addAll(java.util.Arrays.asList(df.collect(): _*)); ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val ops = buf.asScala.map(r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("op")))).toSeq
    // catch-up emits the resolved state as +I: updated 5, no 7
    assert(ops.count(_._2 == "+I") == 19, ops.toString)
    assert(!ops.contains((7L, "+I")))
    assert(buf.asScala.exists(r => r.getLong(r.fieldIndex("id")) == 5L &&
      r.getDouble(r.fieldIndex("bal")) == -1.0))
  }

  test("concurrent delta DMLs on one file: the CAS loser re-merges, no resurrect") {
    import spark.implicits._
    import graft.table.{PosixLinkCommitter, SnapshotCommitter}
    val root = java.nio.file.Files.createTempDirectory("v2_dvrace_").toString
    val tbl = new StreamTable(root, spark)
    tbl.appendBatch((0L until 10L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1), 0L)
    val path = tbl.latestSnapshot.get.files.head.path
    tbl.commitDeltaDml(Map(path -> Array(0L, 1L)), Seq.empty, "DELETE")
    // DML B (positions 2,3) merges its vector, then a concurrent DML C
    // (positions 4,5) commits FIRST and B loses the CAS: B's retry must
    // re-merge against C's vector — a stale pre-computed merge would
    // silently resurrect C's deletes (same file path stays live, only its
    // dvPath changed, so a liveness-only check cannot catch this)
    var injected = false
    tbl.committer = new SnapshotCommitter {
      override def publish(t: java.nio.file.Path, c: Array[Byte]): Boolean = {
        if (!injected) {
          injected = true
          tbl.commitDeltaDml(Map(path -> Array(4L, 5L)), Seq.empty, "DELETE")
          false // B's first attempt loses to C
        } else PosixLinkCommitter.publish(t, c)
      }
    }
    try tbl.commitDeltaDml(Map(path -> Array(2L, 3L)), Seq.empty, "DELETE")
    finally tbl.committer = PosixLinkCommitter
    assert(tbl.read.select("id").as[Long].collect().sorted.toSeq ==
      (6L until 10L), "both concurrent DMLs' deletes must land")
    val meta = tbl.latestSnapshot.get.files.head
    assert(meta.dvCount.contains(6L), meta.toString)
    // genuinely overlapping concurrent DML still fails loudly on retry
    var injected2 = false
    tbl.committer = new SnapshotCommitter {
      override def publish(t: java.nio.file.Path, c: Array[Byte]): Boolean = {
        if (!injected2) {
          injected2 = true
          tbl.commitDeltaDml(Map(path -> Array(7L)), Seq.empty, "DELETE")
          false
        } else PosixLinkCommitter.publish(t, c)
      }
    }
    val e = intercept[IllegalArgumentException] {
      try tbl.commitDeltaDml(Map(path -> Array(7L)), Seq.empty, "DELETE")
      finally tbl.committer = PosixLinkCommitter
    }
    assert(e.getMessage.contains("already-deleted"), e.getMessage)
    assert(tbl.read.select("id").as[Long].collect().sorted.toSeq ==
      Seq(6L, 8L, 9L))
    StreamTable.deleteTree(java.nio.file.Paths.get(root))
  }

  test("delta DML statements leave no fragment staging dirs under the root") {
    val (cat, wh) = freshCatalog("dvfrag")
    spark.sql(s"CREATE TABLE $cat.d.f (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('rowlevel.mode'='dv')")
    spark.sql(s"INSERT INTO $cat.d.f SELECT id, concat('r', id) " +
      "FROM range(0, 200)")
    spark.sql(s"DELETE FROM $cat.d.f WHERE id % 10 = 3") // non-pushable: delta door
    spark.sql(s"UPDATE $cat.d.f SET v = 'u' WHERE id % 10 = 4")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d.f").head().getLong(0) == 180L)
    val leftover = java.nio.file.Files.list(java.nio.file.Paths.get(s"$wh/d.db/f"))
      .iterator()
    val dirs = new scala.collection.mutable.ArrayBuffer[String]
    while (leftover.hasNext) dirs += leftover.next().getFileName.toString
    assert(!dirs.exists(_.startsWith(".staging-dvfrag")),
      s"fragment staging dirs must be reclaimed: $dirs")
  }
}
