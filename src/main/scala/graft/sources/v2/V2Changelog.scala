package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.StreamTable

/** Streaming CHANGELOG read of a primary-key table —
  * `readStream.format("graft").option("read-changelog", true).load(root)` —
  * emitting the full retraction alphabet (`+I` insert, `-U` old image,
  * `+U` new image, `-D` delete; the reference's changelog tableau,
  * `Readme.md:113-127`) as an `op` column beside the table's own schema.
  * This is Paimon's audit_log/CDC stream: the surface a downstream
  * aggregate or CDC consumer reads to stay correct under upserts, where the
  * plain append stream would double-count superseded rows.
  *
  * Offsets are snapshot-id PAIRS walked by the trigger: each micro-batch
  * covers `(start, end]` and nets the interval — per changed key, the OLD
  * resolved image (at `start`) retracts and the NEW resolved image (at
  * `end`) asserts, exactly [[StreamTable.changelogWithRetractions]]'s
  * semantics (oracled against it). The initial catch-up (`start = -1`)
  * emits the current resolved state as `+I` (Paimon `latest-full`).
  *
  * Execution is the PK merge-on-read plan run TWICE per bucket — old
  * winners, new winners — inside the reader: per-bucket, zero exchanges,
  * working set = the bucket's distinct keys (see [[GraftPkScanBuilder]]'s
  * scale notes; changed-key tracking rides the same pass over the new
  * files, so the interval diff costs one extra hash set, not a join).
  */
class GraftChangelogV2Table(base: GraftV2Table) extends Table with SupportsRead {

  private[v2] val t = base.table
  require(t.primaryKey.isDefined,
    s"${base.name()}: read-changelog requires a primary-key table — an " +
      "append table's changelog IS its append stream (drop the option)")
  require(t.effectiveEngine != "partial-update",
    s"${base.name()} has merge-engine=partial-update: its per-field " +
      "sequence structs need the library view — " +
      "StreamTable.changelogWithRetractions")

  private[v2] val baseSchema: StructType = base.schema()
  private[v2] val renames: Map[String, String] = base.renames

  override def name(): String = s"${base.name()}$$changelog"

  override def schema(): StructType =
    StructType(baseSchema.fields :+ StructField("op", StringType, nullable = false))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val outer = this
    () => new GraftChangelogScan(outer)
  }
}

class GraftChangelogScan(table: GraftChangelogV2Table) extends Scan {
  override def readSchema(): StructType = table.schema()
  override def description(): String =
    s"GraftChangelogScan ${table.name()} merge=${table.t.effectiveEngine}"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangelogStream(table.t, table.baseSchema, table.renames)
}

/** Snapshot-pair micro-batch stream (same offset/admission model as
  * [[GraftMicroBatchStream]]; `-1` = before the first commit). */
class GraftChangelogStream(table: StreamTable, baseSchema: StructType,
    nameMap: Map[String, String])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def snaps = table.snapshots

  @volatile private var availableEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(currentLatest())

  override def initialOffset(): Offset = GraftOffset(-1L)
  private def currentLatest(): Offset =
    GraftOffset(snaps.lastOption.map(_.id).getOrElse(-1L))
  override def latestOffset(): Offset = availableEnd.getOrElse(currentLatest())
  override def latestOffset(startOffset: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = currentLatest()
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  // ---- the merge-internal schema (file-level names; see GraftPkScan) -----
  private val fileBase: StructType =
    if (nameMap.isEmpty) baseSchema
    else StructType(baseSchema.map(f => f.copy(name = nameMap.getOrElse(f.name, f.name))))
  private val internal: StructType = StructType(fileBase.fields ++ Seq(
    StructField(StreamTable.SeqColName, LongType),
    StructField(StreamTable.TombstoneColName, BooleanType)))
  private val pk = table.primaryKey.get

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    val e = end.asInstanceOf[GraftOffset].snapshotId
    if (e <= s) return Array.empty
    val all = snaps
    def filesAt(id: Long): Seq[graft.table.DataFileMeta] =
      all.find(_.id == id).map(_.files).getOrElse(Seq.empty)
    if (s >= 0 && !all.exists(_.id == s))
      throw new IllegalStateException(
        s"changelog offset snapshot $s has been retention-expired at " +
          s"${table.root}: cannot compute the interval diff")
    val oldFiles = if (s < 0) Seq.empty else filesAt(s)
    val newFiles = filesAt(e)
    // keys "changed in the interval" come from the diffed LEVEL-0 files
    // (compaction rewrites are layout maintenance, not logical changes); the
    // initial catch-up treats every file as new so the full state emits +I
    val newOnly: Set[String] =
      if (s < 0) newFiles.map(_.path).toSet
      else {
        val seen = oldFiles.map(_.path).toSet
        newFiles.filterNot(f => seen(f.path)).filter(_.level == 0)
          .map(_.path).toSet
      }
    // one partition per hash bucket when the layout proves co-location of
    // every key version; otherwise a single (serial, still correct) group
    val both = oldFiles ++ newFiles
    val groups: Seq[(Seq[String], Seq[String])] =
      if (both.isEmpty) Seq.empty
      else if (both.forall(_.bucket.isDefined)) {
        val o = oldFiles.groupBy(_.bucket.get); val n = newFiles.groupBy(_.bucket.get)
        (o.keySet ++ n.keySet).toSeq.sorted.map { b =>
          (o.getOrElse(b, Seq.empty).map(_.path).sorted,
            n.getOrElse(b, Seq.empty).map(_.path).sorted)
        }
      } else Seq((oldFiles.map(_.path).sorted, newFiles.map(_.path).sorted))
    groups.map { case (of, nf) =>
      GraftChangelogPartition(of, nf, nf.filter(newOnly)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (table.effectiveEngine == "aggregation")
      // the aggregation dual: old/new states are per-key FOLDS, not winners;
      // sum/count fields must fold in BIGINT/DOUBLE (same guard as the scan)
      GraftChangelogAggReaderFactory(internal, baseSchema.length,
        pk.map(internal.fieldIndex).toArray,
        table.aggSpec.get.map { case (f, fn) =>
          val fileN = nameMap.getOrElse(f, f)
          if (fn == "sum" || fn == "count")
            require(internal(internal.fieldIndex(fileN)).dataType == LongType ||
                internal(internal.fieldIndex(fileN)).dataType == DoubleType,
              s"$fn($f): changelog fold needs a BIGINT or DOUBLE field")
          (internal.fieldIndex(fileN), fn)
        }.toArray)
    else
      GraftChangelogReaderFactory(internal, baseSchema.length,
        pk.map(internal.fieldIndex).toArray,
        table.seqCol.map(internal.fieldIndex).getOrElse(-1),
        internal.fieldIndex(StreamTable.SeqColName),
        internal.fieldIndex(StreamTable.TombstoneColName),
        table.effectiveEngine == "first-row")

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One bucket's changelog interval: the bucket's live files at the start
  * snapshot, at the end snapshot, and which of the latter are NEW level-0
  * commits (the changed-key evidence). */
case class GraftChangelogPartition(oldFiles: Seq[String], newFiles: Seq[String],
    newOnly: Seq[String]) extends InputPartition

case class GraftChangelogReaderFactory(internal: StructType, outLen: Int,
    pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, tombIdx: Int,
    firstRow: Boolean) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftChangelogReader(p.asInstanceOf[GraftChangelogPartition],
      internal, outLen, pkIdxs, seqIdx, commitIdx, tombIdx, firstRow)
}

/** Executor-side interval diff of one bucket: resolve winners at the start
  * and end snapshots (two hash merges), collect the keys the interval's new
  * level-0 files touched (including tombstones), and emit the netted ops:
  * old+new → `-U`/`+U`, old only → `-D`, new only → `+I`; a key inserted
  * AND deleted inside the interval nets to nothing, and a stale arrival
  * that lost resolution emits an identical `-U`/`+U` pair (a delta consumer
  * nets zero) — the exact [[StreamTable.changelogWithRetractions]] rules. */
class GraftChangelogReader(p: GraftChangelogPartition, internal: StructType,
    outLen: Int, pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, tombIdx: Int,
    firstRow: Boolean) extends PartitionReader[InternalRow] {

  private val dts: Array[DataType] = internal.fields.map(_.dataType)

  private def opRow(w: InternalRow, op: String): InternalRow = {
    val out = new Array[Any](outLen + 1)
    var i = 0
    while (i < outLen) { out(i) = w.get(i, dts(i)); i += 1 }
    out(outLen) = UTF8String.fromString(op)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private lazy val rows: Iterator[InternalRow] = {
    val oldW = PkMerge.winners(p.oldFiles.map((_, -1L)), internal, pkIdxs,
      seqIdx, commitIdx, firstRow, Array.empty)
    val changed = scala.collection.mutable.LinkedHashSet[List[Any]]()
    val newOnly = p.newOnly.toSet
    val newW = PkMerge.winners(p.newFiles.map((_, -1L)), internal, pkIdxs,
      seqIdx, commitIdx, firstRow, Array.empty,
      onRow = (key, path) => if (newOnly(path)) changed += key)
    changed.iterator.flatMap { key =>
      val o = Option(oldW.get(key)).filterNot(PkMerge.isTombstone(_, tombIdx))
      val n = Option(newW.get(key)).filterNot(PkMerge.isTombstone(_, tombIdx))
      (o, n) match {
        case (Some(ow), Some(nw)) => Iterator(opRow(ow, "-U"), opRow(nw, "+U"))
        case (Some(ow), None) => Iterator(opRow(ow, "-D"))
        case (None, Some(nw)) => Iterator(opRow(nw, "+I"))
        case (None, None) => Iterator.empty
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    val has = rows.hasNext
    if (has) current = rows.next()
    has
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

case class GraftChangelogAggReaderFactory(internal: StructType, outLen: Int,
    pkIdxs: Array[Int], specs: Array[(Int, String)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftChangelogAggReader(p.asInstanceOf[GraftChangelogPartition],
      internal, outLen, pkIdxs, specs)
}

/** The aggregation-engine interval diff of one bucket: old/new states are
  * per-key FOLDS ([[PkMerge.accumulate]]) instead of winners; per changed
  * key the old ACCUMULATED image retracts (`-U`) and the new asserts
  * (`+U`) — a downstream aggregate that applies retract/accumulate lands on
  * the merged value, exactly what a changelog over an aggregation table
  * means. Keys first seen in the interval emit `+I`; the aggregation engine
  * has no delete path, so `-D` never fires from commits (it can only arise
  * from snapshot surgery like rollback, where the old image retracts). */
class GraftChangelogAggReader(p: GraftChangelogPartition, internal: StructType,
    outLen: Int, pkIdxs: Array[Int], specs: Array[(Int, String)])
    extends PartitionReader[InternalRow] {

  private def opRow(v: Array[Any], op: String): InternalRow = {
    val out = new Array[Any](outLen + 1)
    System.arraycopy(v, 0, out, 0, outLen)
    out(outLen) = UTF8String.fromString(op)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private lazy val rows: Iterator[InternalRow] = {
    val oldAcc = PkMerge.accumulate(p.oldFiles.map((_, -1L)), internal,
      pkIdxs, specs, outLen, Array.empty)
    val changed = scala.collection.mutable.LinkedHashSet[List[Any]]()
    val newOnly = p.newOnly.toSet
    val newAcc = PkMerge.accumulate(p.newFiles.map((_, -1L)), internal,
      pkIdxs, specs, outLen, Array.empty,
      onRow = (key, path) => if (newOnly(path)) changed += key)
    changed.iterator.flatMap { key =>
      (Option(oldAcc.get(key)), Option(newAcc.get(key))) match {
        case (Some(o), Some(n)) => Iterator(opRow(o, "-U"), opRow(n, "+U"))
        case (Some(o), None) => Iterator(opRow(o, "-D"))
        case (None, Some(n)) => Iterator(opRow(n, "+I"))
        case (None, None) => Iterator.empty
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    val has = rows.hasNext
    if (has) current = rows.next()
    has
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
