package graft.sources.v2

import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** System/metadata tables through the V2 catalog — Paimon's `` `t$files` ``
  * UX (`tutorial/guide.md:200-232`) as REAL identifiers:
  *
  * {{{
  *   SELECT * FROM mycat.db.`tbl$files`
  *   SELECT * FROM mycat.db.`tbl$snapshots`
  * }}}
  *
  * Metadata is manifest/footer-derived and file-count-sized, so it is served
  * as a [[LocalScan]] (driver-local rows — the same shape catalog metadata
  * tables use in Spark itself); the underlying frame's own computation
  * (footer stats via mapPartitions) still ran distributed before the
  * collect. */
class MetadataV2Table(tableName: String, df: => DataFrame)
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val frame = df
        val conv = CatalystTypeConverters.createToCatalystConverter(frame.schema)
        val collected: Array[InternalRow] =
          frame.collect().map(r => conv(r).asInstanceOf[InternalRow])
        new LocalScan {
          override def readSchema(): StructType = frame.schema
          override def rows(): Array[InternalRow] = collected
          override def description(): String = s"GraftMetadataScan $tableName"
        }
      }
    }
}
