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
  * Execution, two regimes:
  *  - **`changelog-producer` tables (the fast path)**: every covered commit
  *    persisted its netted change rows at write time, so the trigger reads
  *    ONLY the interval's changelog files and folds them per key
  *    ([[GraftChangelogDeltaReader]]) — O(interval changelog) per trigger,
  *    never a table resolve. This is what a 20 s-trigger CDC consumer on a
  *    100 TB table stands on.
  *  - **fallback (pre-option history)**: the PK merge-on-read plan run
  *    TWICE per bucket — old winners, new winners — inside the reader:
  *    per-bucket, zero exchanges, working set = the bucket's distinct keys;
  *    the interval walks COMMIT-BY-COMMIT for its changed-key evidence, so
  *    a level-0 file absorbed by an in-interval compaction still
  *    contributes its keys (scanned key-only as `extraChanged`).
  */
class GraftChangelogV2Table(base: GraftV2Table) extends Table with SupportsRead {

  private[v2] val t = base.table
  require(t.primaryKey.isDefined,
    s"${base.name()}: read-changelog requires a primary-key table — an " +
      "append table's changelog IS its append stream (drop the option)")

  private[v2] val baseSchema: StructType = base.schema()
  private[v2] val renames: Map[String, String] = base.renames

  override def name(): String = s"${base.name()}$$changelog"

  override def schema(): StructType =
    StructType(baseSchema.fields :+ StructField("op", StringType, nullable = false))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val outer = this
    // shares the batch change surfaces' pruning/point-lookup builder so the
    // streaming and batch doors can never diverge in what they prune
    new GraftOpScanBuilder(t, baseSchema, "op", renames, (pruned, onlyBucket) =>
      new GraftChangelogScan(outer, Option(options.get("consumer-id")),
        GraftV2Table.scanStartOf(options.get, t), pruned, onlyBucket))
  }
}

class GraftChangelogScan(table: GraftChangelogV2Table,
    consumerId: Option[String] = None,
    scanStart: Option[Long] = None,
    pruned: Option[StructType] = None,
    onlyBucket: Option[Int] = None) extends Scan {
  override def readSchema(): StructType = StructType(
    pruned.getOrElse(table.baseSchema).fields :+
      StructField("op", StringType, nullable = false))
  override def description(): String =
    s"GraftChangelogScan ${table.name()} merge=${table.t.effectiveEngine} " +
      onlyBucket.map(b => s"bucket=$b ").getOrElse("") +
      s"ReadSchema: ${readSchema().catalogString}"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangelogStream(table.t, table.baseSchema, table.renames,
      consumerId, scanStart, pruned, onlyBucket)
}

/** Snapshot-pair micro-batch stream (same offset/admission model as
  * [[GraftMicroBatchStream]]; `-1` = before the first commit). With
  * `.option("consumer-id", …)` the stream is a RETENTION ROOT with the same
  * advance-after-commit contract as the plain source — the CDC interval
  * diff needs every covered snapshot, so expiry must never outrun a
  * registered reader (without one, an over-eager retention policy fails the
  * stream loudly at the next trigger). */
class GraftChangelogStream(table: StreamTable, baseSchema: StructType,
    nameMap: Map[String, String], consumerId: Option[String] = None,
    scanStart: Option[Long] = None, pruned: Option[StructType] = None,
    onlyBucket: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  consumerId.foreach { id =>
    if (!table.consumers.exists(_._1 == id)) table.registerConsumer(id, 0L)
  }

  // headers only — offset bookkeeping and interval planning never hydrate
  // a full live set (planInterval hydrates exactly the interval endpoints)
  private def snaps = table.snapshotHeaders

  @volatile private var availableEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(currentLatest())

  // scan.mode=latest / scan.snapshot-id=N position a FRESH stream (changes
  // only / from a commit); a checkpointed one resumes from its stored offset
  override def initialOffset(): Offset = GraftOffset(scanStart.getOrElse(-1L))
  private def currentLatest(): Offset = // per-trigger poll: filename scan only
    GraftOffset(table.latestSnapshotId.getOrElse(-1L))
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

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    val e = end.asInstanceOf[GraftOffset].snapshotId
    ChangelogPlanning.planInterval(table, snaps, s, e, onlyBucket)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangelogPlanning.readerFactory(table, baseSchema, nameMap, pruned)

  override def commit(end: Offset): Unit =
    // committed trigger → the next undelivered snapshot is end+1; retention
    // may release everything before `end`. Forward-only (a restored older
    // checkpoint must not crash the query; advanceConsumer refuses
    // regressions) — same contract as [[GraftMicroBatchStream.commit]].
    consumerId.foreach { id =>
      val next = end.asInstanceOf[GraftOffset].snapshotId + 1
      if (!table.consumers.exists { case (cid, pos) => cid == id && pos >= next })
        table.advanceConsumer(id, next)
    }
  override def stop(): Unit = ()
}

/** The changelog interval planner + reader wiring, shared by the STREAMING
  * CDC source ([[GraftChangelogStream]], one interval per trigger) and the
  * BATCH incremental/audit surfaces (`incremental-between`,
  * `` `t$audit_log` `` — V2Incremental.scala): one `(start, end]` netting
  * plan, identical either way. */
private[graft] object ChangelogPlanning {

  /** The merge-internal schema (file-level names; see GraftPkScan). */
  private[v2] def fileBaseOf(baseSchema: StructType,
      nameMap: Map[String, String]): StructType =
    if (nameMap.isEmpty) baseSchema
    else StructType(baseSchema.map(f => f.copy(name = nameMap.getOrElse(f.name, f.name))))

  private[v2] def internalOf(fileBase: StructType): StructType =
    StructType(fileBase.fields ++ Seq(
      StructField(StreamTable.SeqColName, LongType),
      StructField(StreamTable.TombstoneColName, BooleanType)))

  /** Bucket point lookup over pushed filters: an equality on the bucket key
    * pins the single bucket that can hold the key — 1/numBuckets of every
    * interval cut before any I/O (the PK point read, on the change
    * surfaces). Same conditions as [[GraftPkScan]]'s. */
  def bucketPointLookup(t: StreamTable, schema: StructType,
      pushed: Array[org.apache.spark.sql.sources.Filter]): Option[Int] =
    for {
      k <- t.bucketKey
      // fixed-bucket only: a change INTERVAL spans snapshots, and a dynamic
      // table's generations hash under different counts — a single bucket id
      // cannot pin a key across a split boundary
      if t.numBuckets > 0
      dt <- schema.find(_.name == k).map(_.dataType)
      if dt == LongType || dt == IntegerType
      v <- pushed.collectFirst {
        case org.apache.spark.sql.sources.EqualTo(a, v: Number) if a == k => v }
    } yield {
      val in = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](t.numBuckets,
          if (dt == LongType) v.longValue() else v.intValue()))
      (if (dt == LongType) GraftBucketLong else GraftBucketInt)
        .produceResult(in).intValue()
    }

  /** Plan the netted `(s, e]` interval over `snaps`: the persisted-changelog
    * fast path when every covered commit produced, else the per-bucket
    * state-diff walked commit-by-commit (so a level-0 file absorbed by an
    * in-interval compaction still contributes its keys). `s = -1` is the
    * initial catch-up: the full state emits `+I`. `onlyBucket` (a pushed
    * bucket-key point lookup) keeps a single bucket's group — honored only
    * when the layout records bucket ids on every file (the unbucketed
    * fallback group must read everything to stay correct). */
  def planInterval(table: StreamTable, snaps: Seq[graft.table.Snapshot],
      s: Long, e: Long, onlyBucket: Option[Int] = None): Array[InputPartition] = {
    if (e <= s) return Array.empty
    // indexed once: the walk below touches each id several times, and a
    // linear find per touch made catch-up planning O(interval × snapshots).
    // `snaps` are HEADERS (unhydrated): the per-commit walk reads delta
    // manifests, and only the two interval ENDPOINTS hydrate — O(delta)
    // driver work per trigger at any live-file count.
    val byId = snaps.map(s0 => s0.id -> s0).toMap
    def snapAt(id: Long): graft.table.Snapshot =
      byId.getOrElse(id, throw new IllegalStateException(
        s"changelog interval snapshot $id has been retention-expired at " +
          s"${table.root}: cannot compute the interval diff (register a " +
          "consumer-id or widen snapshot retention to protect slow readers)"))
    def filesAt(id: Long): Seq[graft.table.DataFileMeta] =
      table.hydrated(snapAt(id)).files

    if (s >= 0) {
      // fast path (`changelog-producer`): the interval (s, e] is EXACTLY
      // covered by a chain of changelog-carrying snapshots — a write-time
      // producer ('input') covers (id-1, id], a DEFERRED producer
      // ('lookup'/'full-compaction') covers (clogFromId, id] with the span
      // netted at compaction time. The trigger then reads ONLY the chain's
      // changelog files, O(delta) instead of two full resolves. A chain
      // that overshoots s (a deferred span reaching below the reader's
      // progress — its files can't be sliced) falls back to the state diff,
      // so a consumer that advanced mid-span never double-reads. The walk
      // runs BEFORE the every-snapshot existence check: changelog files
      // are SELF-CONTAINED, so a retained covering snapshot still serves
      // its span after the covered mid-span write snapshots expire (they
      // are exactly the ones retention ages out first); a broken chain is
      // never an error here — the fallback's own existence check below
      // raises the helpful retention message when the diff truly needs a
      // missing snapshot.
      val chain = scala.collection.mutable.ListBuffer.empty[Long]
      var cursor = e
      var chainOk = true
      while (chainOk && cursor > s) {
        byId.get(cursor) match {
          case Some(snap) if snap.clogProduced =>
            chain.prepend(cursor)
            cursor = snap.clogFromId.getOrElse(cursor - 1)
          case _ => chainOk = false
        }
      }
      if (chainOk && cursor == s) {
        // files ordered and commit-grouped by SNAPSHOT id — the table's
        // commit order. minSeq (the writer's batch/stamp sequence) is
        // neither monotone with snapshot order nor unique once independent
        // writers interleave (a stamped sink epoch's sequence can sort
        // before an earlier appendBatch commit, or collide with one).
        val clog = chain.toSeq.flatMap(id => snapAt(id).changelog.map(f => (f, id)))
        if (clog.isEmpty) return Array.empty
        val groups: Seq[Seq[(graft.table.DataFileMeta, Long)]] =
          if (clog.forall(_._1.bucket.isDefined))
            clog.groupBy(_._1.bucket.get).toSeq
              .filter(g => onlyBucket.forall(_ == g._1))
              .sortBy(_._1).map(_._2)
          else Seq(clog)
        return groups.map { fs =>
          GraftChangelogDeltaPartition(
            fs.sortBy { case (f, id) => (id, f.path) }
              .map { case (f, id) => (f.path, id) })
            : InputPartition
        }.toArray
      }
    }

    val oldFiles = if (s < 0) Seq.empty else filesAt(s)
    val newFiles = filesAt(e)
    // keys "changed in the interval" come from the level-0 files ADDED at
    // each covered commit (walked so a later in-interval compaction cannot
    // absorb a commit's changes) plus files a state-REPLACING commit
    // removed (keys an overwrite dropped must emit -D) — the shared rule
    // [[StreamTable.intervalEvidence]]; files not live at the end snapshot
    // are scanned KEY-ONLY, their images come from the resolved states.
    // The initial catch-up treats every file as new so the state emits +I.
    val oldPathSet = oldFiles.map(_.path).toSet
    val (newOnly: Set[String], extras: Seq[graft.table.DataFileMeta],
        oldEv: Seq[graft.table.DataFileMeta]) =
      if (s < 0) (newFiles.map(_.path).toSet, Seq.empty, Seq.empty)
      else {
        val (added, removedEv) = StreamTable.intervalEvidence(snapAt,
          table.deltaOf, table.hydrated, s, e)
        val endPaths = newFiles.map(_.path).toSet
        // removal evidence LIVE at the start snapshot is key-collected
        // during the old-state resolve (zero extra I/O); only evidence
        // live at NEITHER end needs its own key-only scan
        (added.map(_.path).toSet.intersect(endPaths),
          (added.filterNot(f => endPaths(f.path)) ++
            removedEv.filterNot(f =>
              endPaths(f.path) || oldPathSet(f.path))).distinct,
          removedEv.filter(f => oldPathSet(f.path)).distinct)
      }
    // one partition per hash bucket when the layout proves co-location of
    // every key version; otherwise a single (serial, still correct) group
    val both = oldFiles ++ newFiles ++ extras
    val groups: Seq[(Seq[String], Seq[String], Seq[String], Seq[String])] =
      if (both.isEmpty) Seq.empty
      else if (both.forall(_.bucket.isDefined)) {
        val o = oldFiles.groupBy(_.bucket.get); val n = newFiles.groupBy(_.bucket.get)
        val x = extras.groupBy(_.bucket.get)
        val oc = oldEv.groupBy(_.bucket.get)
        (o.keySet ++ n.keySet ++ x.keySet).toSeq
          .filter(b => onlyBucket.forall(_ == b)).sorted.map { b =>
          (o.getOrElse(b, Seq.empty).map(_.path).sorted,
            n.getOrElse(b, Seq.empty).map(_.path).sorted,
            x.getOrElse(b, Seq.empty).map(_.path).sorted,
            oc.getOrElse(b, Seq.empty).map(_.path).sorted)
        }
      } else Seq((oldFiles.map(_.path).sorted, newFiles.map(_.path).sorted,
        extras.map(_.path).sorted, oldEv.map(_.path).sorted))
    groups.map { case (of, nf, xf, oc) =>
      GraftChangelogPartition(of, nf, nf.filter(newOnly), xf, oc): InputPartition
    }.toArray
  }

  /** The per-engine reader factory (winners for deduplicate/first-row,
    * folds for aggregation, per-field merges for partial-update); every
    * factory also serves the persisted-changelog delta partitions.
    *
    * `pruned` (when the query projects a subset) makes the readers emit —
    * and READ — only the projected columns: the merge bookkeeping (pk,
    * sequence field, commit seq, tombstone, per-field provenance of the
    * projected fields) rides in a trailing region the output never copies,
    * so a 3-column CDC consumer of a 200-column table reads 3 columns plus
    * keys, not 200. */
  def readerFactory(table: StreamTable, baseSchema: StructType,
      nameMap: Map[String, String],
      pruned: Option[StructType] = None): PartitionReaderFactory = {
    val fullFile = fileBaseOf(baseSchema, nameMap)
    val prunedFile = fileBaseOf(pruned.getOrElse(baseSchema), nameMap)
    val pk = table.primaryKey.get
    // key/sequence columns the projection dropped still drive the merge —
    // appended after the output region, read but never emitted
    val extras = (pk ++ table.seqCol.toSeq).distinct
      .filterNot(prunedFile.fieldNames.contains)
      .map(n => fullFile.find(_.name == n).getOrElse(throw new IllegalStateException(
        s"key/sequence column $n missing from table schema")))
    val outLen = prunedFile.length
    val dataFields = prunedFile.fields.toSeq ++ extras
    val dataLen = dataFields.length
    val internal = StructType(dataFields ++ Seq(
      StructField(StreamTable.SeqColName, LongType),
      StructField(StreamTable.TombstoneColName, BooleanType)))
    if (table.effectiveEngine == "partial-update") {
      // per-field last-non-null states, with the persisted fseq provenance
      // structs in the read schema (the PK scan's exact fold) — only the
      // PROJECTED fields race; dropped fields resolve independently
      val internalP = StructType(internal.fields ++ prunedFile.collect {
        case f if !pk.contains(f.name) =>
          StructField(StreamTable.FieldSeqPrefix + f.name, PkMerge.FseqType)
      })
      GraftChangelogPartialReaderFactory(internalP, outLen, dataLen,
        pk.map(internalP.fieldIndex).toArray,
        prunedFile.fields.zipWithIndex.collect {
          case (f, i) if !pk.contains(f.name) =>
            (i, internalP.fieldIndex(StreamTable.FieldSeqPrefix + f.name))
        },
        table.seqCol.map(internalP.fieldIndex).getOrElse(-1),
        internalP.fieldIndex(StreamTable.SeqColName))
    } else if (table.effectiveEngine == "aggregation")
      // the aggregation dual: old/new states are per-key FOLDS, not winners;
      // sum/count fields must fold in BIGINT/DOUBLE (same guard as the
      // scan); fields the projection dropped are neither read nor folded
      GraftChangelogAggReaderFactory(internal, outLen, dataLen,
        pk.map(internal.fieldIndex).toArray,
        table.aggSpec.get.flatMap { case (f, fn) =>
          val fileN = nameMap.getOrElse(f, f)
          if (!prunedFile.fieldNames.contains(fileN)) None
          else {
            require(fn != "last_non_null_value",
              s"last_non_null_value($f) is sequence-ordered — the native " +
                "CDC fold is order-blind; read the library changelog " +
                "(StreamTable.changesBetween) instead")
            if (fn == "sum" || fn == "count")
              require(internal(internal.fieldIndex(fileN)).dataType == LongType ||
                  internal(internal.fieldIndex(fileN)).dataType == DoubleType,
                s"$fn($f): changelog fold needs a BIGINT or DOUBLE field")
            Some((internal.fieldIndex(fileN), fn))
          }
        }.toArray)
    else
      GraftChangelogReaderFactory(internal, outLen, dataLen,
        pk.map(internal.fieldIndex).toArray,
        table.seqCol.map(internal.fieldIndex).getOrElse(-1),
        internal.fieldIndex(StreamTable.SeqColName),
        internal.fieldIndex(StreamTable.TombstoneColName),
        table.effectiveEngine == "first-row")
  }
}

/** One bucket's changelog interval: the bucket's live files at the start
  * snapshot, at the end snapshot, which of the latter are NEW level-0
  * commits (the changed-key evidence), interval-touched files live at
  * NEITHER end (scanned for KEYS only — their surviving content lives in
  * the resolved states), and removal-evidence files live at the START
  * (key-collected during the old resolve, zero extra reads). */
case class GraftChangelogPartition(oldFiles: Seq[String], newFiles: Seq[String],
    newOnly: Seq[String], extraChanged: Seq[String] = Seq.empty,
    oldChanged: Seq[String] = Seq.empty)
    extends InputPartition

/** One bucket's PRODUCED changelog slice: the interval's persisted
  * changelog files as `(path, snapshotId)` in SNAPSHOT order — the O(delta)
  * fast path; the reader folds commit-at-a-time on the snapshot id. */
case class GraftChangelogDeltaPartition(files: Seq[(String, Long)])
    extends InputPartition

case class GraftChangelogReaderFactory(internal: StructType, outLen: Int,
    dataLen: Int, pkIdxs: Array[Int], seqIdx: Int, commitIdx: Int, tombIdx: Int,
    firstRow: Boolean) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case d: GraftChangelogDeltaPartition =>
        new GraftChangelogDeltaReader(d, internal, outLen, dataLen, pkIdxs)
      case _ =>
        new GraftChangelogReader(p.asInstanceOf[GraftChangelogPartition],
          internal, outLen, pkIdxs, seqIdx, commitIdx, tombIdx, firstRow)
    }
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
    val changed = scala.collection.mutable.LinkedHashSet[List[Any]]()
    val oldOnly = p.oldChanged.toSet
    val oldW = PkMerge.winners(p.oldFiles.map((_, -1L)), internal, pkIdxs,
      seqIdx, commitIdx, firstRow, Array.empty,
      onRow = (key, path) => if (oldOnly(path)) changed += key)
    val newOnly = p.newOnly.toSet
    val newW = PkMerge.winners(p.newFiles.map((_, -1L)), internal, pkIdxs,
      seqIdx, commitIdx, firstRow, Array.empty,
      onRow = (key, path) => if (newOnly(path)) changed += key)
    PkMerge.collectKeys(p.extraChanged, internal, pkIdxs, changed)
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
    dataLen: Int, pkIdxs: Array[Int], specs: Array[(Int, String)])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case d: GraftChangelogDeltaPartition =>
        // the fold already happened at write time: the persisted rows carry
        // accumulated images, so the delta fold is engine-agnostic
        new GraftChangelogDeltaReader(d, internal, outLen, dataLen, pkIdxs)
      case _ =>
        new GraftChangelogAggReader(p.asInstanceOf[GraftChangelogPartition],
          internal, outLen, pkIdxs, specs)
    }
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
    val changed = scala.collection.mutable.LinkedHashSet[List[Any]]()
    val oldOnly = p.oldChanged.toSet
    val oldAcc = PkMerge.accumulate(p.oldFiles.map((_, -1L)), internal,
      pkIdxs, specs, outLen, Array.empty,
      onRow = (key, path) => if (oldOnly(path)) changed += key)
    val newOnly = p.newOnly.toSet
    val newAcc = PkMerge.accumulate(p.newFiles.map((_, -1L)), internal,
      pkIdxs, specs, outLen, Array.empty,
      onRow = (key, path) => if (newOnly(path)) changed += key)
    PkMerge.collectKeys(p.extraChanged, internal, pkIdxs, changed)
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

case class GraftChangelogPartialReaderFactory(internal: StructType, outLen: Int,
    dataLen: Int, pkIdxs: Array[Int], fields: Array[(Int, Int)], seqIdx: Int,
    commitIdx: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case d: GraftChangelogDeltaPartition =>
        new GraftChangelogDeltaReader(d, internal, outLen, dataLen, pkIdxs)
      case _ =>
        new GraftChangelogPartialReader(p.asInstanceOf[GraftChangelogPartition],
          internal, outLen, pkIdxs, fields, seqIdx, commitIdx)
    }
}

/** The partial-update interval diff of one bucket: old/new states are
  * per-key per-FIELD folds ([[PkMerge.partialState]]); per changed key the
  * old merged image retracts (`-U`) and the new asserts (`+U`) — the
  * partial-update engine has no delete path, so `-D` only arises from
  * snapshot surgery (rollback). Keys first seen in the interval emit
  * `+I`. */
class GraftChangelogPartialReader(p: GraftChangelogPartition, internal: StructType,
    outLen: Int, pkIdxs: Array[Int], fields: Array[(Int, Int)], seqIdx: Int,
    commitIdx: Int) extends PartitionReader[InternalRow] {

  private def opRow(v: Array[Any], op: String): InternalRow = {
    val out = new Array[Any](outLen + 1)
    System.arraycopy(v, 0, out, 0, outLen)
    out(outLen) = UTF8String.fromString(op)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private lazy val rows: Iterator[InternalRow] = {
    val changed = scala.collection.mutable.LinkedHashSet[List[Any]]()
    val oldOnly = p.oldChanged.toSet
    val oldAcc = PkMerge.partialState(p.oldFiles.map((_, -1L)), internal,
      pkIdxs, fields, seqIdx, commitIdx, outLen, Array.empty,
      onRow = (key, path) => if (oldOnly(path)) changed += key)
    val newOnly = p.newOnly.toSet
    val newAcc = PkMerge.partialState(p.newFiles.map((_, -1L)), internal,
      pkIdxs, fields, seqIdx, commitIdx, outLen, Array.empty,
      onRow = (key, path) => if (newOnly(path)) changed += key)
    PkMerge.collectKeys(p.extraChanged, internal, pkIdxs, changed)
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

/** The O(delta) changelog reader: fold one bucket's PERSISTED per-commit
  * changelog files into the interval's netted ops — per key, the old image
  * comes from the FIRST covered commit that retracted it and the new image
  * from the LAST covered commit that touched it ("existed before" iff that
  * first op was a retraction), exactly the netting the state-diff reader
  * computes — but from O(interval changelog rows), never a table resolve.
  * Engine-agnostic: the write-time producer already resolved the images
  * (winners for deduplicate/first-row, folds for aggregation, per-field
  * merges for partial-update).
  *
  * Rows are folded COMMIT-AT-A-TIME (files are commit-ordered; intra-commit
  * row order is arbitrary, so a commit's `-U`/`+U` pair must land together
  * before the cross-commit transition applies). */
class GraftChangelogDeltaReader(p: GraftChangelogDeltaPartition,
    internal: StructType, outLen: Int, dataLen: Int, pkIdxs: Array[Int])
    extends PartitionReader[InternalRow] {

  // changelog files carry the table's base columns + the op (no engine
  // sequencing columns — the producer resolved them away); under pruning
  // the [outLen, dataLen) region holds key/sequence columns the projection
  // dropped — read for keying, never emitted
  private val readSchema: StructType =
    StructType(internal.fields.take(dataLen) :+ StructField("op", StringType))
  private val dts: Array[DataType] = readSchema.fields.map(_.dataType)
  private val opIdx = dataLen

  /** Cross-commit per-key state. */
  private final class St(var existed: Boolean, var old: InternalRow,
    var nw: InternalRow)

  private lazy val rows: Iterator[InternalRow] = {
    val state = new java.util.LinkedHashMap[List[Any], St]()
    // one commit's ops per key: (retraction image | null, assertion | null)
    val commitOps = new java.util.LinkedHashMap[List[Any], (InternalRow, InternalRow)]()
    def flushCommit(): Unit = {
      commitOps.forEach { (key, ops) =>
        val (retract, assertImg) = ops
        var st = state.get(key)
        if (st == null) {
          st = new St(existed = retract != null, old = retract, nw = null)
          state.put(key, st)
        }
        st.nw = assertImg // null iff the commit deleted the key
      }
      commitOps.clear()
    }
    var curCommit = Long.MinValue
    p.files.foreach { case (path, commitSeq) =>
      if (commitSeq != curCommit) { flushCommit(); curCommit = commitSeq }
      val r = new GraftPartitionReader(path, readSchema, Array.empty,
        limit = None, fileSeq = commitSeq)
      try {
        while (r.next()) {
          val row = r.get()
          val key = pkIdxs.map(i => row.get(i, dts(i))).toList
          val op = row.getUTF8String(opIdx).toString
          val prev = commitOps.get(key)
          val (retract, assertImg) =
            if (prev == null) (null: InternalRow, null: InternalRow) else prev
          commitOps.put(key, op match {
            case "-U" | "-D" => (row, assertImg)
            case _           => (retract, row) // +U / +I
          })
        }
      } finally r.close()
    }
    flushCommit()
    state.values.iterator.asScala.flatMap { st =>
      def tag(w: InternalRow, op: String): InternalRow = {
        val out = new Array[Any](outLen + 1)
        var i = 0
        while (i < outLen) { out(i) = w.get(i, dts(i)); i += 1 }
        out(outLen) = UTF8String.fromString(op)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      }
      (st.existed, Option(st.nw)) match {
        case (true, Some(nw)) => Iterator(tag(st.old, "-U"), tag(nw, "+U"))
        case (true, None)     => Iterator(tag(st.old, "-D"))
        case (false, Some(nw)) => Iterator(tag(nw, "+I"))
        case (false, None)     => Iterator.empty // inserted AND deleted inside
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
