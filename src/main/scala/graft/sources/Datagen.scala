package graft.sources

import graft.QDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Datagen sources (reference ops 2A#1-2) + changelog rendering (2A#19).
  *
  * The reference drives everything from Flink's datagen connector: an
  * unbounded random source at 1000 rows/s (Readme.md:88-101) and a bounded
  * 1..1000 sequence (Readme.md:132-154). Spark-native analogs:
  * `spark.range` for bounded sequences and the `rate-micro-batch` streaming
  * source for deterministic unbounded generation.
  */
object Datagen {

  /** events re-written hive-partitioned by event_type, once per sf dir. */
  private val partitionedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def partitionedEventsDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    partitionedDirs.computeIfAbsent(d, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_part_").toString
      graft.Tables.events(s, d).write.mode("overwrite")
        .partitionBy("event_type").parquet(out)
      out
    })

  /** The two different-schema order slices (pre-ADD-COLUMN / post-DROP),
    * staged once per sf dir — a fresh temp dir per invocation would leak a
    * full orders copy every Verify/Bench call. */
  private val evolvedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def evolvedOrdersDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    evolvedDirs.computeIfAbsent(d, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
      val o = graft.Tables.orders(s, d)
      o.filter(col("o_orderkey") < 7500).select("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$out/slice=a")
      o.filter(col("o_orderkey") >= 7500).select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$out/slice=b")
      out
    })

  /** A second partitioned events copy staged for q_source_partition_overwrite
    * — separate from [[partitionedEventsDir]] because the overwrite op
    * MUTATES its click partition (the pruning query's dir must stay
    * pristine). */
  private val overwriteDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def overwriteEventsDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    overwriteDirs.computeIfAbsent(d, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_dynpart_").toString
      graft.Tables.events(s, d).write.mode("overwrite")
        .partitionBy("event_type").parquet(out)
      out
    })

  /** Each document's text staged as its OWN raw file (`doc-<id>.txt`), once
    * per sf dir — the on-disk shape a raw multimodal corpus arrives in (one
    * object per image/audio/doc) before ingestion into columnar form. The
    * layout is FLAT (one directory, id in the file name) like an object-store
    * prefix, not hive-partitioned: a dir per doc made the scan's file listing
    * walk N directories to find N files — pure listing overhead that
    * dominated the read (~8 s of the bench at 5k docs). Files are written
    * executor-side (foreachPartition + java.nio), no driver loop. */
  private val binaryDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def binaryDocsDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    binaryDirs.computeIfAbsent(d, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_bin_").toString
      graft.Tables.documents(s, d).select("doc_id", "text")
        .repartition(32)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, s"doc-${r.getLong(0)}.txt"),
              (r.getString(1) + "\n").getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      out
    })

  /** Orders staged as a z-order-compacted StreamTable, once per sf dir:
    * appended in 4 hash-scrambled batches (so the incoming layout clusters
    * NEITHER column), then `sortCompact(o_custkey, o_totalprice)` rewrites
    * the live set along the 2-D z-curve. */
  private val zorderTables =
    new java.util.concurrent.ConcurrentHashMap[String, graft.table.StreamTable]()
  private def zorderOrders(s: org.apache.spark.sql.SparkSession,
      d: String): graft.table.StreamTable =
    zorderTables.computeIfAbsent(d, { _ =>
      val t = new graft.table.StreamTable(
        java.nio.file.Files.createTempDirectory("graft_zorder_").toString, s)
      val o = graft.Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("__b", pmod(hash(col("o_orderkey")), lit(4)))
      for (b <- 0 until 4)
        t.appendBatch(o.filter(col("__b") === b).drop("__b"), b.toLong)
      t.sortCompact("o_custkey", "o_totalprice", targetFileCount = 16)
      t
    })

  val all: Seq[QDef] = Seq(
    // binaryFile source (the raw-object ingestion surface multimodal
    // pipelines start from: one file per image/audio/document, read as
    // (path, length, content) WITHOUT decoding). The identity comes from
    // the PATH (regexp on the file name), the payload stays opaque
    // bytes — planning never opens content, exactly the contract
    // q_mm_decode_meta picks up from columnar form. At corpus scale this
    // is the one-time ingestion pass that turns an object store's million
    // small files into parquet; the scan parallelizes per-file.
    QDef(
      "q_source_binary_files",
      """SELECT doc_id, CAST(len(text) + 1 AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val dir = binaryDocsDir(s, d)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(dir)
        .select(
          regexp_extract(col("path"), "doc-(\\d+)\\.txt", 1)
            .cast("bigint").as("doc_id"),
          col("length").as("n_bytes"))
        .orderBy("doc_id")
    },

    // Bounded sequence datagen (sensor_info shape, Readme.md:132-154):
    // sequence key + derived payload columns. Payloads are deterministic
    // arithmetic on the key (not rand()) so DuckDB replays them exactly.
    QDef(
      "q_source_datagen_bounded",
      """SELECT CAST(id AS BIGINT) AS sensor_id,
        |  CAST(id % 180 - 90 AS DOUBLE) + id / 1000.0 AS latitude,
        |  CAST(id % 360 - 180 AS DOUBLE) + id / 500.0 AS longitude,
        |  CAST(id % 4 AS INTEGER) AS generation
        |FROM range(1, 1001) t(id) ORDER BY sensor_id""".stripMargin) { (s, d) =>
      s.range(1, 1001)
        .select(col("id").as("sensor_id"),
          ((col("id") % 180 - 90).cast("double") + col("id") / 1000.0).as("latitude"),
          ((col("id") % 360 - 180).cast("double") + col("id") / 500.0).as("longitude"),
          (col("id") % 4).cast("int").as("generation"))
        .orderBy("sensor_id")
    },

    // Unbounded datagen analog (measurements shape, Readme.md:88-101):
    // rate-micro-batch emits exactly rowsPerBatch values per trigger — the
    // deterministic stand-in for 'rows-per-second'='1000'. One batch here;
    // production would run Trigger.ProcessingTime("20 seconds") forever.
    QDef(
      "q_source_rate_stream",
      """SELECT CAST(1000 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS min_v,
        |  CAST(999 AS BIGINT) AS max_v""".stripMargin) { (s, d) =>
      val name = s"rate_${java.util.UUID.randomUUID().toString.take(8)}"
      val q = s.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("startTimestamp", 0L)
        .load()
        .select(col("value"),
          pmod(col("value") * 37, lit(1000)).as("sensor_id"),
          round(pmod(col("value") * 7919, lit(451)) / 10.0, 1).as("reading"))
        .writeStream.format("memory").queryName(name)
        .trigger(Trigger.Once()).start()
      q.awaitTermination()
      s.table(name).agg(count(lit(1)).as("n_rows"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    },

    // Source-format breadth: the engine reads/writes CSV and JSON alongside
    // parquet. Round-trip nation through each format and aggregate — the
    // oracle runs on the original table, so the round-trip must be lossless.
    QDef(
      "q_source_csv_roundtrip",
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft_csv_").toString
      graft.Tables.nation(s, d).write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema(graft.Tables.nation(s, d).schema).csv(out)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
        .orderBy("n_regionkey")
    },

    QDef(
      "q_source_orc_roundtrip",
      """SELECT n_regionkey, count(*) AS n, min(n_nationkey) AS min_key
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft_orc_").toString
      graft.Tables.nation(s, d).write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), min(col("n_nationkey")).as("min_key"))
        .orderBy("n_regionkey")
    },

    QDef(
      "q_source_json_roundtrip",
      """SELECT n_regionkey, count(*) AS n, max(n_name) AS last_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft_json_").toString
      graft.Tables.nation(s, d).write.mode("overwrite").json(out)
      s.read.schema(graft.Tables.nation(s, d).schema).json(out)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max(col("n_name")).as("last_name"))
        .orderBy("n_regionkey")
    },

    // Partitioned parquet layout + partition pruning: the table is written
    // hive-partitioned by event_type; the filter then prunes whole
    // directories at PLANNING time (PartitionFilters in the scan, asserted
    // in PlanSpec) — at 100 TB the difference between listing one partition
    // and scanning the table. The oracle reads the unpartitioned original.
    QDef(
      "q_source_partitioned_pruning",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin) { (s, d) =>
      val out = partitionedEventsDir(s, d)
      s.read.parquet(out)
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // Dynamic partition overwrite (`partitionOverwriteMode=dynamic`): an
    // INSERT OVERWRITE that replaces ONLY the partitions present in the
    // incoming data — here the 'click' partition is rewritten with doubled
    // values while every other partition's files are untouched. This is the
    // partition-level upsert pattern for reprocessing one day/source of a
    // 100 TB partitioned table without rewriting (or even listing) the
    // rest; static mode would wipe the whole table first. Idempotent by
    // construction: the rewrite derives from the source events table, so
    // repeat runs (Bench's min-of-2) converge to the same state.
    QDef(
      "q_source_partition_overwrite",
      """SELECT event_id, event_type, user_id,
        |  CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val out = overwriteEventsDir(s, d)
      val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        graft.Tables.events(s, d).filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
      } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      s.read.parquet(out)
        .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
        .orderBy("event_id")
    },

    // Schema evolution on read (the Paimon `ALTER TABLE ADD COLUMN` story,
    // 2A#14, on the file layer): two parquet slices written with DIFFERENT
    // column sets — the old slice before a column existed, the new slice
    // after another was dropped — merge into one unified schema under
    // `mergeSchema`, missing columns null-filled per slice. At 100 TB this
    // is how years of layout drift stay readable without rewriting old
    // files. The oracle reproduces the per-slice nulls from the base table.
    QDef(
      "q_source_schema_merge",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 7500 THEN o_custkey ELSE NULL END AS o_custkey,
        |  CASE WHEN o_orderkey >= 7500 THEN o_totalprice ELSE NULL END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val out = evolvedOrdersDir(s, d)
      s.read.option("mergeSchema", "true").parquet(s"$out/slice=a", s"$out/slice=b")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Dynamic partition pruning: the fact side is partitioned on the join
    // key, the dim side only becomes selective AFTER its own aggregation +
    // filter — so no static pushdown can prune the fact scan. Spark's DPP
    // reuses the dim side's broadcast result as a runtime IN-subquery over
    // the fact's PARTITION column: whole directories are skipped at
    // execution time. On a 100 TB date/source-partitioned fact table this —
    // not the join algorithm — is the dominant cost lever; PlanSpec asserts
    // the dynamicpruning expression landed in the scan's PartitionFilters.
    QDef(
      "q_join_dpp",
      """WITH dim AS (
        |  SELECT event_type, count(*) AS n_type FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  max(dim.n_type) AS n_type
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |WHERE dim.event_type IN ('click', 'purchase')
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val fact = s.read.parquet(partitionedEventsDir(s, d))
      val dim = graft.Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n_type"))
        .filter(col("event_type").isin("click", "purchase"))
      fact.join(dim, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.X.dsum(col("value")).as("sum_value"),
          max(col("n_type")).as("n_type"))
        .orderBy("event_type")
    },

    // Z-order clustered read (Paimon sort-compact, 'sort-order'='zorder'):
    // the staged table was rewritten along the (o_custkey, o_totalprice)
    // z-curve, so each file's footer carries a tight 2-D bounding box and
    // readWhere prunes files on EITHER column — the scan-side payoff that
    // makes a 100 TB box query metadata-bounded instead of full-scan. The
    // custkey band arrives via stats skipping; the totalprice band is the
    // residual predicate. StreamTableSpec asserts the pruning counts; here
    // the oracle pins that the re-layout changed NOTHING about the data.
    QDef(
      "q_source_zorder_skipping",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey BETWEEN 100 AND 400
        |  AND o_totalprice BETWEEN 100000 AND 200000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      zorderOrders(s, d).readWhere("o_custkey", 100.0, 400.0)
        .where(col("o_totalprice") >= 100000.0 && col("o_totalprice") <= 200000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Changelog op rendering (2A#19): streaming results carry a change-type
    // column; an append-only pipe is all '+I' (exactly what the reference's
    // tableau outputs show, Readme.md:113-127).
    QDef(
      "q_stream_changelog",
      """SELECT '+I' AS op, event_id, event_type FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      graft.streaming.StreamOps.changelogScan(s, d)
    },
  )
}
