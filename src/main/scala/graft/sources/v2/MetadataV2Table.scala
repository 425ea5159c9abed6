package graft.sources.v2

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
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
  * Served through a [[V1Scan]] bridge that hands Spark the backing
  * DataFrame's OWN RDD — the metadata view executes as a distributed scan
  * (for `$files` over a delta-manifest table, one task per manifest
  * partition parsing and emitting its file rows), and per-row metadata is
  * NEVER collected to the driver the way a LocalScan would require. Filters
  * and aggregates over the view run as ordinary plan nodes on top. */
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
        new V1Scan {
          override def readSchema(): StructType = frame.schema
          override def toV1TableScan[T <: BaseRelation with TableScan](
              context: SQLContext): T =
            (new BaseRelation with TableScan {
              override def sqlContext: SQLContext = context
              override def schema: StructType = frame.schema
              override def buildScan(): RDD[Row] = frame.rdd
            }).asInstanceOf[T]
          override def description(): String = s"GraftMetadataScan $tableName"
        }
      }
    }
}
