package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._

import graft.table.{DataFileMeta, StreamTable}

/** Primary-key merge-on-read through the V2 connector — the reference's
  * signature table (the PK `sensor_info` upsert table,
  * `tutorial/guide.md:59-74`) readable through plain SQL
  * (`SELECT * FROM graft.db.sensor_info`), not just the library view.
  *
  * Execution model — the distributed dual of [[StreamTable.read]]'s
  * window-resolve, with NO shuffle at all:
  *
  *  - PK tables write hash-bucketed on a bucket key that is a subset of the
  *    primary key (`pmod(murmur3(key), n)`, recorded per file in the
  *    manifest), so EVERY version of a key — updates, tombstones, compacted
  *    winners — lives in one bucket. The scan plans one [[InputPartition]]
  *    per bucket and each reader resolves last-writer-wins locally with a
  *    hash merge: winner per key by largest (`sequence.field`, commit batch)
  *    for `deduplicate`, smallest for `first-row`; tombstone winners emit
  *    nothing. The library's global window shuffle becomes zero exchanges.
  *  - Merge engines that require a distributed AGGREGATE
  *    (aggregation/partial-update re-merge partial states) cannot run inside
  *    a per-file reader and keep the library view
  *    ([[GraftV2Table.newScanBuilder]] refuses them).
  *
  * Filter safety: only predicates over PRIMARY-KEY columns may prune files
  * or rows before the merge — all versions of a key share its key columns,
  * so pre- and post-merge filtering agree. A non-key predicate could skip
  * the file holding a key's WINNING version and resurrect a superseded row;
  * those filters stay Spark-side residuals (every pushed filter is re-applied
  * as a residual anyway — pushdown is a fast path, never a correctness
  * dependency).
  *
  * 100 TB posture: the per-reader working set is one bucket's DISTINCT keys
  * (the hash-merge dual of Paimon's sorted-run merge; compaction keeps the
  * version multiplicity per bucket near 1), and the bucket count is the
  * declared write-time parallelism knob. A key-equality lookup prunes to a
  * single bucket before any I/O (the PK point read). Files without recorded
  * bucket ids (legacy manifests) degrade to one merge group — correct, not
  * parallel; rewrite via compaction to restore the layout.
  */
class GraftPkScanBuilder(table: GraftV2Table, fullSchema: StructType,
    pk: Seq[String], nameMap: Map[String, String] = Map.empty) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Safe to evaluate pre-merge: simple comparisons whose every reference is
    * a primary-key column of a stats-covered type. */
  private def pkPushable(f: Filter): Boolean = {
    def ok(attr: String) = pk.contains(attr) &&
      fullSchema.find(_.name == attr).exists(_.dataType match {
        case LongType | IntegerType | DoubleType | FloatType | StringType => true
        case _ => false
      })
    f match {
      case EqualTo(a, v) => v != null && ok(a)
      case GreaterThan(a, _) => ok(a)
      case GreaterThanOrEqual(a, _) => ok(a)
      case LessThan(a, _) => ok(a)
      case LessThanOrEqual(a, _) => ok(a)
      case _ => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(pkPushable)
    filters // all residual (incl. the pushed ones): merge output is re-checked
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    val kept = fullSchema.filter(f => keep.contains(f.name))
    // requested metadata columns ride after the data columns (provenance of
    // the WINNING version, filled by the per-file reader from the manifest)
    val meta = requiredSchema.fields.filter(f =>
      GraftV2Table.MetaCols.contains(f.name) && !fullSchema.fieldNames.contains(f.name))
    required = StructType(kept ++ meta)
  }

  override def build(): Scan =
    new GraftPkScan(table, fullSchema, required, pushed, pk, nameMap)
}

class GraftPkScan(table: GraftV2Table, fullSchema: StructType,
    required: StructType, pushed: Array[Filter], pk: Seq[String],
    nameMap: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // Key/sequence columns are never renameable (the evolution guard), so the
  // merge bookkeeping columns keep their names; only projected PAYLOAD
  // columns may need declared → file-level translation (rows are positional,
  // so the translated reader output aligns with the declared readSchema).
  private val fileRequired: StructType =
    if (nameMap.isEmpty) required
    else StructType(required.map(f => f.copy(name = nameMap.getOrElse(f.name, f.name))))

  private val t = table.table
  private val firstRow = t.effectiveEngine == "first-row"
  private val aggregation = t.effectiveEngine == "aggregation"

  // aggregation-engine constraints the reader's fold depends on: no
  // metadata columns (an accumulated row has no single source file), and
  // additive fields in a type whose sum the library view matches bit-for-bit
  if (aggregation) {
    require(!required.fieldNames.exists(GraftV2Table.MetaCols.contains),
      s"${table.name()}: metadata columns are undefined on an aggregation " +
        "merge view (the merged row has no single source file)")
    t.aggSpec.get.foreach { case (f, fn) =>
      if ((fn == "sum" || fn == "count") && required.fieldNames.contains(f))
        require(fullSchema.find(_.name == f).exists(x =>
            x.dataType == LongType || x.dataType == DoubleType),
          s"${table.name()}: $fn($f) through the connector needs a BIGINT " +
            "or DOUBLE field (INT/FLOAT sums widen in the library view — " +
            "read those through StreamTable.read)")
    }
  }

  // ---- driver-side pruning (metadata-only, like partition pruning) -------
  private val allFiles = table.liveFiles
  private val kept: Seq[DataFileMeta] = {
    // bucket point lookup: an equality on the bucket key pins the single
    // bucket that can hold the key — 1/numBuckets of the table cut before
    // any I/O (Paimon's PK point read)
    val bucketPruned = bucketPointLookup match {
      case Some(b) => allFiles.filter(_.bucket.forall(_ == b))
      case None => allFiles
    }
    if (pushed.isEmpty) bucketPruned
    else {
      val conf = new Configuration()
      bucketPruned.filter { f =>
        val (_, mins, maxs) = StreamTable.footerStats(f.path, conf)
        pushed.forall(FileSkip.keep(_, mins, maxs))
      }
    }
  }

  private def bucketPointLookup: Option[Int] =
    for {
      k <- t.bucketKey
      dt <- fullSchema.find(_.name == k).map(_.dataType)
      if dt == LongType || dt == IntegerType
      v <- pushed.collectFirst { case EqualTo(a, v: Number) if a == k => v }
    } yield {
      val in = new GenericInternalRow(Array[Any](t.numBuckets,
        if (dt == LongType) v.longValue() else v.intValue()))
      (if (dt == LongType) GraftBucketLong else GraftBucketInt)
        .produceResult(in).intValue()
    }

  /** One merge group per recorded bucket; a manifest with any unbucketed
    * file degrades to a single group (correct, serial — the documented
    * legacy fallback). Files merge in commit order for deterministic
    * iteration (exact (seq, commit) ties are arbitrary, as in the library). */
  private val groups: Seq[(Int, Seq[DataFileMeta])] =
    if (kept.isEmpty) Seq.empty
    else if (kept.forall(_.bucket.isDefined))
      kept.groupBy(_.bucket.get).toSeq.sortBy(_._1)
        .map { case (b, fs) => (b, fs.sortBy(f => (f.minSeq, f.path))) }
    else Seq((-1, kept.sortBy(f => (f.minSeq, f.path))))

  // ---- merge-internal schema: projection ++ pk/seq/commit/tombstone ------
  private[v2] val internal: StructType = {
    val extras = (pk ++ t.seqCol.toSeq).distinct
      .filterNot(n => fileRequired.fieldNames.contains(n))
      .map(n => fullSchema.find(_.name == n).getOrElse(
        throw new IllegalStateException(s"key/sequence column $n missing from table schema")))
    StructType(fileRequired.fields.toSeq ++ extras ++ Seq(
      StructField(StreamTable.SeqColName, LongType),
      StructField(StreamTable.TombstoneColName, BooleanType)))
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftPkScan ${table.name()} buckets=${groups.size} files=${kept.size}/${allFiles.size} " +
      s"merge=${t.effectiveEngine} PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** Pre-merge upper bound (the resolved view can only shrink) — enough for
    * Catalyst's broadcast decision, which needs "provably small", not exact. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, kept.map(_.fileSizeInBytes).sum))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(kept.map(_.rowCount).sum)
  }

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    throw new UnsupportedOperationException(
      s"${table.name()} is a primary-key table: stream its CHANGELOG " +
        "(readStream.option(\"read-changelog\", true)) or use " +
        "StreamTable.readStream — raw upsert files are not an append stream")

  /** Storage-partitioned join over the MERGED view: the per-bucket plan is
    * already key-grouped, so under V2 bucketing the scan reports it and a
    * join of the resolved PK table against a co-bucketed fact on the key
    * needs no exchange on either side — the upsert dim ⋈ fact join with
    * the merge AND the join both riding the write-time layout. Engages only
    * when every group is a real bucket and the scan projects the bucket key
    * with a bucketable type (same conditions as [[GraftScan]]'s SPJ). */
  private def spjPartitioning: Option[Int] = {
    val confOn = try {
      org.apache.spark.sql.SparkSession.active.conf
        .get("spark.sql.sources.v2.bucketing.enabled") == "true"
    } catch { case _: Exception => false }
    t.bucketKey match {
      case Some(k) if confOn && groups.nonEmpty && groups.forall(_._1 >= 0) &&
          required.fieldNames.contains(k) &&
          fullSchema.find(_.name == k).exists(f =>
            f.dataType == LongType || f.dataType == IntegerType) =>
        Some(t.numBuckets)
      case _ => None
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjPartitioning match {
      case Some(n) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
            n, t.bucketKey.get)),
          groups.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          groups.size)
    }

  override def planInputPartitions(): Array[InputPartition] =
    groups.map { case (b, fs) =>
      GraftPkInputPartition(fs.map(f => (f.path, f.minSeq)), b): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggregation)
      GraftPkAggReaderFactory(internal, required.length,
        pk.map(internal.fieldIndex).toArray,
        // fold plan: only projected aggregated fields accumulate (the rest
        // of `required` is necessarily primary-key columns — constant per
        // key); fields the projection dropped never cost anything
        t.aggSpec.get.collect {
          case (f, fn) if fileRequired.fieldNames.contains(
              nameMap.getOrElse(f, f)) =>
            (internal.fieldIndex(nameMap.getOrElse(f, f)), fn)
        }.toArray, pushed)
    else
      GraftPkReaderFactory(internal, required.length,
        pk.map(internal.fieldIndex).toArray,
        t.seqCol.map(internal.fieldIndex).getOrElse(-1),
        internal.fieldIndex(StreamTable.SeqColName),
        internal.fieldIndex(StreamTable.TombstoneColName),
        firstRow, pushed)
}

/** All live files of one hash bucket (or the whole table for the legacy
  * unbucketed fallback), with their manifest commit sequences. The bucket id
  * doubles as the storage-partitioned-join partition key (ignored unless the
  * scan reported KeyGroupedPartitioning). */
case class GraftPkInputPartition(files: Seq[(String, Long)], bucketId: Int)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

case class GraftPkReaderFactory(internal: StructType, outLen: Int,
    pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, tombIdx: Int,
    firstRow: Boolean, pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPkMergeReader(p.asInstanceOf[GraftPkInputPartition].files,
      internal, outLen, pkIdxs, seqIdx, commitIdx, tombIdx, firstRow, pushed)
}

/** Executor-side hash merge of one bucket: stream every file's rows through
  * the shared [[GraftPartitionReader]] (schema evolution null-fills, pushed
  * PK predicates hit parquet row groups, metadata columns fill from the
  * manifest), keep the winning version per key, then emit the non-tombstone
  * winners projected to the scan's output schema. Working set = the bucket's
  * distinct keys. */
class GraftPkMergeReader(files: Seq[(String, Long)], internal: StructType,
    outLen: Int, pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, tombIdx: Int,
    firstRow: Boolean, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val dts: Array[DataType] = internal.fields.map(_.dataType)

  private lazy val merged: Iterator[InternalRow] = {
    val winners = PkMerge.winners(files.map { case (p, s) => (p, s) },
      internal, pkIdxs, seqIdx, commitIdx, firstRow, pushed)
    winners.values.iterator.asScala.collect {
      case w if !PkMerge.isTombstone(w, tombIdx) =>
        PkMerge.project(w, outLen, dts): InternalRow
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    val has = merged.hasNext
    if (has) current = merged.next()
    has
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

case class GraftPkAggReaderFactory(internal: StructType, outLen: Int,
    pkIdxs: Array[Int], specs: Array[(Int, String)], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPkAggMergeReader(p.asInstanceOf[GraftPkInputPartition].files,
      internal, outLen, pkIdxs, specs, pushed)
}

/** Executor-side per-bucket fold for merge-engine=aggregation: every
  * version of a key combines field-wise by its declared function (sum/min/
  * max/count — associative and commutative, which is exactly what makes the
  * bucket-local fold equal the distributed aggregate; NULL is the identity,
  * matching Spark's null-skipping aggregates). Compacted partial aggregates
  * re-merge with fresh rows to the same result, the same closure the
  * library's three merge sites rely on. */
class GraftPkAggMergeReader(files: Seq[(String, Long)], internal: StructType,
    outLen: Int, pkIdxs: Array[Int], specs: Array[(Int, String)],
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  private lazy val merged: Iterator[InternalRow] =
    PkMerge.accumulate(files, internal, pkIdxs, specs, outLen, pushed)
      .values.iterator.asScala.map(v => new GenericInternalRow(v): InternalRow)

  private var current: InternalRow = _
  override def next(): Boolean = {
    val has = merged.hasNext
    if (has) current = merged.next()
    has
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Shared per-bucket hash-merge machinery (the PK scan and the changelog
  * stream both resolve winners this way). */
private[v2] object PkMerge {
  /** Null-safe ordering compare; null = -infinity (matches the library's
    * window resolve: desc nulls-last / asc nulls-first). */
  def cmpAny(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else a.asInstanceOf[Comparable[Any]].compareTo(b)

  def isTombstone(r: InternalRow, tombIdx: Int): Boolean = {
    val v = r.get(tombIdx, BooleanType)
    v != null && v.asInstanceOf[Boolean]
  }

  /** First `outLen` fields of a merged row as a fresh output row. */
  def project(w: InternalRow, outLen: Int, dts: Array[DataType]): GenericInternalRow = {
    val out = new Array[Any](outLen)
    var i = 0
    while (i < outLen) { out(i) = w.get(i, dts(i)); i += 1 }
    new GenericInternalRow(out)
  }

  /** Field-wise combine for the aggregation engine: NULL is the identity
    * (matching Spark's null-skipping aggregates); sum/count add in the
    * field's own type (guarded to BIGINT/DOUBLE at scan build). */
  def combineAgg(fn: String, a: Any, b: Any): Any =
    if (a == null) b
    else if (b == null) a
    else fn match {
      case "sum" | "count" => (a, b) match {
        case (x: java.lang.Long, y: java.lang.Long) =>
          java.lang.Long.valueOf(x.longValue() + y.longValue())
        case (x: java.lang.Double, y: java.lang.Double) =>
          java.lang.Double.valueOf(x.doubleValue() + y.doubleValue())
        case other => throw new IllegalStateException(s"unsummable $other")
      }
      case "min" => if (cmpAny(a, b) <= 0) a else b
      case "max" => if (cmpAny(a, b) >= 0) a else b
    }

  /** Per-key field-wise fold for merge-engine=aggregation: every version of
    * a key combines by its declared function. Accumulators are the first
    * `outLen` internal fields. `onRow(key, path)` observes every raw row. */
  def accumulate(files: Seq[(String, Long)], internal: StructType,
      pkIdxs: Array[Int], specs: Array[(Int, String)], outLen: Int,
      pushed: Array[Filter],
      onRow: (List[Any], String) => Unit = (_, _) => ())
      : java.util.HashMap[List[Any], Array[Any]] = {
    val dts = internal.fields.map(_.dataType)
    val acc = new java.util.HashMap[List[Any], Array[Any]]()
    files.foreach { case (path, fileSeq) =>
      val r = new GraftPartitionReader(path, internal, pushed,
        limit = None, fileSeq = fileSeq)
      try {
        while (r.next()) {
          val row = r.get()
          val key = pkIdxs.map(i => row.get(i, dts(i))).toList
          onRow(key, path)
          val cur = acc.get(key)
          if (cur == null) {
            val fresh = new Array[Any](outLen)
            var i = 0
            while (i < outLen) { fresh(i) = row.get(i, dts(i)); i += 1 }
            acc.put(key, fresh)
          } else {
            specs.foreach { case (i, fn) =>
              cur(i) = combineAgg(fn, cur(i), row.get(i, dts(i)))
            }
          }
        }
      } finally r.close()
    }
    acc
  }

  /** Stream every file's rows through [[GraftPartitionReader]] and keep the
    * winning version per key — largest (sequence.field, commit batch) for
    * deduplicate, smallest for first-row; exact ties resolve to the later-
    * merged row (arbitrary, as in the library's window resolve). Tombstone
    * winners STAY in the map (callers decide whether a tombstone means
    * "absent" or "-D evidence"). `onRow(key, path)` observes every raw row. */
  def winners(files: Seq[(String, Long)], internal: StructType,
      pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, firstRow: Boolean,
      pushed: Array[Filter],
      onRow: (List[Any], String) => Unit = (_, _) => ())
      : java.util.HashMap[List[Any], InternalRow] = {
    val dts = internal.fields.map(_.dataType)
    def cmpOrd(x: InternalRow, y: InternalRow): Int = {
      val bySeq = if (seqIdx < 0) 0
        else cmpAny(x.get(seqIdx, dts(seqIdx)), y.get(seqIdx, dts(seqIdx)))
      if (bySeq != 0) bySeq
      else cmpAny(x.get(commitIdx, dts(commitIdx)), y.get(commitIdx, dts(commitIdx)))
    }
    val winners = new java.util.HashMap[List[Any], InternalRow]()
    files.foreach { case (path, fileSeq) =>
      val r = new GraftPartitionReader(path, internal, pushed,
        limit = None, fileSeq = fileSeq)
      try {
        while (r.next()) {
          val row = r.get() // fresh GenericInternalRow per call — safe to keep
          val key = pkIdxs.map(i => row.get(i, dts(i))).toList
          onRow(key, path)
          val prev = winners.get(key)
          val wins = prev == null || {
            val c = cmpOrd(row, prev)
            if (firstRow) c < 0 else c >= 0
          }
          if (wins) winners.put(key, row)
        }
      } finally r.close()
    }
    winners
  }
}
