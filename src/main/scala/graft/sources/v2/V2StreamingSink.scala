package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.table.StreamTable

/** Native V2 streaming sink: `df.writeStream.format("graft")` /
  * `.toTable("cat.db.t")` — the write-side dual of the snapshot-offset
  * streaming source, completing the stream–batch duality natively:
  *
  *  - executors write their partitions as parquet files into the table's
  *    staging area ([[GraftStreamingDataWriter]] — the symmetric inverse of
  *    the source's Group reader);
  *  - ONLY files named in committed task messages reach the driver commit
  *    (a retried task's orphan file is never referenced and is abandoned in
  *    staging), which moves them into the append dir and publishes ONE
  *    snapshot per epoch ([[StreamTable.commitExternalFiles]]);
  *  - exactly-once across restarts via PER-WRITER replay evidence in
  *    [[StreamTable.commitExternalFiles]]: each committed snapshot records
  *    (writer, writerEpoch), and a best-effort `_writers/<id>` high-water
  *    file survives even snapshot retention — a restarted checkpoint
  *    replaying an epoch finds its own evidence and skips, while a fresh
  *    checkpoint (new queryId ⇒ new writer id) can never collide with
  *    another writer's committed epochs. A global batch-id watermark could
  *    NOT serve here: any other writer advancing it would make a first-time
  *    epoch look replayed.
  *
  * Append tables only: the PK LWW view orders by the stamped commit
  * sequence that [[StreamTable.appendBatch]]'s DataFrame path provides —
  * PK upsert streams keep the library `writeStream`/foreachBatch front
  * door. Bucketed tables accept the write with `bucket = None` files
  * (bucket-dependent fast paths fall back; the next compaction restores
  * the clustering).
  */
class GraftStreamingWrite(table: StreamTable, schema: StructType,
    queryId: String) extends StreamingWrite {

  require(table.primaryKey.isEmpty,
    "the V2 streaming sink is append-only; PK upsert streams go through " +
      "StreamTable.writeStream (the LWW view needs the stamped commit sequence)")
  GraftStreamingWrite.parquetSchema(schema) // fail at planning, not in tasks

  /** Filesystem-safe writer identity: the streaming queryId (stable across
    * restarts of the same checkpoint, fresh for a new one). */
  private val writerId = "q" + queryId.replaceAll("[^A-Za-z0-9._-]", "")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    GraftStreamingWriterFactory(table.root, schema, writerId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (empty, data) = messages.collect { case m: GraftSinkCommitMessage => m }
      .partition(_.rows == 0L)
    // a no-row partition's file never enters the manifest (a trickle stream
    // would otherwise accrue parallelism-many empty files per epoch)
    empty.foreach(m =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(m.path)))
    if (data.nonEmpty)
      table.commitExternalFiles(data.map(_.path).toSeq, writerId, epochId)
    // at COMMIT time sweep strictly-older epochs only: a zombie/speculative
    // task of the CURRENT epoch may still be writing its (never-referenced)
    // twin, and deleting the file under it turns a harmless orphan into
    // spurious task-failure noise — the next epoch's sweep reclaims it
    sweepOrphans(epochId - 1)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: GraftSinkCommitMessage => m.path }
      .foreach(p => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
    // the epoch is dead — every surviving task was aborted, so the current
    // epoch's files are sweepable too
    sweepOrphans(epochId)
  }

  /** Delete THIS writer's staging leftovers for epochs at or before
    * `upToEpoch`: a task that died before sending its commit message (lost
    * executor, speculation) leaves a file no commit or abort ever
    * references — without this sweep the table root leaks disk forever.
    * Committed files were MOVED out of staging, so everything still matching
    * our prefix at ≤ upToEpoch is an orphan; other writers' files (different
    * writer id in the name) are untouched. */
  private def sweepOrphans(upToEpoch: Long): Unit = {
    val Re = s"\\.sink-${java.util.regex.Pattern.quote(writerId)}-e(\\d+)-.*".r
    StreamTable.listDir(java.nio.file.Paths.get(table.root)).foreach { p =>
      p.getFileName.toString match {
        case Re(e) if e.toLong <= upToEpoch => java.nio.file.Files.deleteIfExists(p)
        case _ => ()
      }
    }
  }
}

object GraftStreamingWrite {
  /** StructType → parquet MessageType (the safe primitive set — the same
    * alphabet the source's type bridge reads back). */
  private[v2] def parquetSchema(schema: StructType): MessageType = {
    val fields = schema.fields.map { f =>
      val b = f.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampNTZType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        case dt => throw new UnsupportedOperationException(
          s"graft streaming sink: unsupported type $dt for column ${f.name}")
      }
      b.named(f.name): org.apache.parquet.schema.Type
    }
    new MessageType("spark_schema", fields.toList: _*)
  }
}

case class GraftSinkCommitMessage(path: String, rows: Long)
    extends WriterCommitMessage

case class GraftStreamingWriterFactory(tableRoot: String, schema: StructType,
    writerId: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftStreamingDataWriter(tableRoot, schema, writerId, epochId, partitionId)
}

/** Executor-side parquet writer for one (epoch, partition) slice. The file
  * stays in staging until this task's commit message reaches the driver —
  * speculative/retried twins are simply never referenced. */
class GraftStreamingDataWriter(tableRoot: String, schema: StructType,
    writerId: String, epochId: Long, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val path = new org.apache.hadoop.fs.Path(
    s"$tableRoot/.sink-$writerId-e$epochId-p$partitionId-${UUID.randomUUID().toString.take(8)}.parquet")
  private val conf = new Configuration()
  private val msgType = GraftStreamingWrite.parquetSchema(schema)
  GroupWriteSupport.setSchema(msgType, conf)
  private val writer = ExampleParquetWriter
    .builder(HadoopOutputFile.fromPath(path, conf))
    .withConf(conf)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()
  private val factory = new SimpleGroupFactory(msgType)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType => g.add(name, row.getLong(i))
          case IntegerType => g.add(name, row.getInt(i))
          case DoubleType => g.add(name, row.getDouble(i))
          case FloatType => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType =>
            g.add(name, Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case BinaryType => g.add(name, Binary.fromConstantByteArray(row.getBinary(i)))
          case DateType => g.add(name, row.getInt(i))
          case TimestampNTZType | TimestampType => g.add(name, row.getLong(i))
          case dt => throw new UnsupportedOperationException(dt.toString)
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftSinkCommitMessage(path.toString, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path.toUri.getPath))
  }

  override def close(): Unit = ()
}
