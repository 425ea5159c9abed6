package graft.sources.v2

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.{GraftCatalog, StreamTable}

/** Maintenance procedures through Spark 4's native `CALL` statement — the
  * reference's flink-action jobs (`tutorial/guide.md:172-177` compact,
  * `:180-184` retention) as REAL catalog procedures instead of shell
  * regexes:
  *
  * {{{
  *   CALL mycat.sys.compact(`table` => 'db.t', target_file_count => 4)
  *   CALL mycat.sys.expire_snapshots('db.t', 1, 5, 3600000)
  *   CALL mycat.sys.rollback_to('db.t', '3')      -- snapshot id or tag name
  *   CALL mycat.sys.create_tag('db.t', 'release-1')
  *   CALL mycat.sys.delete_tag('db.t', 'release-1')
  * }}}
  *
  * Each call runs the library's maintenance op (the compaction rewrite is a
  * distributed Spark job; retention/rollback/tags are manifest metadata) and
  * returns a one-row summary as a driver-local scan — the same result shape
  * Paimon's Spark procedures produce. */
object V2Procedures {

  val Namespace: Array[String] = Array("sys")

  def names: Seq[String] =
    Seq("compact", "expire_snapshots", "expire_partitions", "rollback_to",
      "create_tag", "delete_tag", "create_branch", "fast_forward",
      "delete_branch", "rescale", "remove_orphan_files",
      "compact_small_files", "materialize_deletes")

  def load(catalog: => GraftCatalog, name: String): Option[UnboundProcedure] = {
    def p = catalog // materialize lazily per call
    name match {
      // `order_by` turns the rewrite into a SORT-COMPACT (Paimon's
      // sort-compact action): 'sort' range-clusters on the listed columns
      // (leading-column file ranges come out disjoint), 'zorder' interleaves
      // two numeric columns' bits so BOTH dimensions' footer stats stay
      // selective — the file-skipping-quality lever after long unsorted
      // ingest. The chosen clustering is recorded in the table options
      // (`compact.order-by` / `compact.order-strategy`) so operators and
      // follow-up maintenance can see the layout policy.
      case "compact" => Some(procRaw("compact",
        Seq(in("table", StringType),
          in("target_file_count", IntegerType, Some("2")),
          in("order_by", StringType, Some("''")),
          in("strategy", StringType, Some("'sort'"))),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("num_files", IntegerType))),
        (c, db, name, args) => {
          val n = math.max(1, args(1).asInstanceOf[Int])
          val order = Option(args(2)).map(_.asInstanceOf[UTF8String].toString)
            .getOrElse("").trim
          val t = c.getTable(db, name)
          val snap =
            if (order.isEmpty) t.compact(n)
            else {
              val cols = order.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              val strat = Option(args(3)).map(_.asInstanceOf[UTF8String].toString)
                .getOrElse("sort").trim
              val s2 = strat match {
                case "zorder" =>
                  require(cols.size == 2,
                    s"zorder interleaves exactly 2 columns, got $cols")
                  t.sortCompact(cols.head, cols(1), n)
                case "sort" => t.sortCompactOrder(cols, n)
                case other => throw new IllegalArgumentException(
                  s"unknown sort-compact strategy '$other' (sort | zorder)")
              }
              c.alterTable(db, name, Map(
                "compact.order-by" -> cols.mkString(","),
                "compact.order-strategy" -> strat))
              s2
            }
          Array[Any](snap.id, snap.files.size)
        }, p))
      // targeted maintenance: rewrite only groups whose small-file backlog
      // reached the trigger (a minor compaction — rows pass through raw,
      // tombstones retained; see StreamTable.compactSmallFiles). Returns
      // snapshot_id = -1 when no group qualified (zero I/O probe).
      case "compact_small_files" => Some(proc("compact_small_files",
        Seq(in("table", StringType),
          in("small_bytes", LongType, Some((32L << 20).toString)),
          in("trigger", IntegerType, Some("4"))),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("compacted", BooleanType))),
        (t, args) => t.compactSmallFiles(args(1).asInstanceOf[Long],
            math.max(2, args(2).asInstanceOf[Int])) match {
          case Some(snap) => Array[Any](snap.id, true)
          case None => Array[Any](-1L, false)
        }, p))
      // rewrite ONLY the files carrying deletion vectors (applying the
      // suppression): restores the vectorized scan path at cost ∝ dv'd
      // bytes — the surgical follow-up to small DELETEs, far cheaper than
      // sys.compact. snapshot_id = -1 when no vectors exist (zero-I/O probe).
      case "materialize_deletes" => Some(proc("materialize_deletes",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("files_materialized", IntegerType),
          StructField("snapshot_id", LongType))),
        (t, _) => {
          val (n, sid) = t.materializeDeletionVectors()
          Array[Any](n, sid)
        }, p))
      // age out WHOLE partitions as one metadata-only commit (Paimon's
      // expire_partitions): `older_than` overrides the table's
      // `partition.expiration-time`; strategy/formatter default to the
      // `partition.expiration-strategy` / `partition.timestamp-formatter`
      // options (update-time | values-time; see StreamTable.expirePartitions)
      case "expire_partitions" => Some(procRaw("expire_partitions",
        Seq(in("table", StringType),
          in("older_than", StringType, Some("''")),
          in("strategy", StringType, Some("''"))),
        StructType(Seq(StructField("expired_partitions", IntegerType))),
        (c, db, name, args) => {
          val o = c.tableOptions(db, name)
          def str(i: Int): String = Option(args(i))
            .map(_.asInstanceOf[UTF8String].toString.trim).getOrElse("")
          val horizon = Some(str(1)).filter(_.nonEmpty)
            .orElse(o.get("partition.expiration-time"))
            .getOrElse(throw new IllegalArgumentException(
              s"$name: pass older_than or set 'partition.expiration-time'"))
          val strategy = Some(str(2)).filter(_.nonEmpty)
            .orElse(o.get("partition.expiration-strategy"))
            .getOrElse("update-time")
          val fmt = o.getOrElse("partition.timestamp-formatter", "yyyy-MM-dd")
          Array[Any](c.getTable(db, name).expirePartitions(
            graft.table.GraftCatalog.parseDurationMs(horizon), strategy, fmt,
            o.get("partition.timestamp-pattern")))
        }, p))
      case "expire_snapshots" => Some(proc("expire_snapshots",
        Seq(in("table", StringType),
          in("retain_min", IntegerType, Some("1")),
          in("retain_max", IntegerType, Some("2147483647")),
          in("older_than_ms", LongType, Some("0"))),
        StructType(Seq(StructField("expired", IntegerType))),
        (t, args) => Array[Any](t.expireSnapshots(args(1).asInstanceOf[Int],
          args(2).asInstanceOf[Int], args(3).asInstanceOf[Long])), p))
      case "rollback_to" => Some(proc("rollback_to",
        Seq(in("table", StringType), in("version", StringType)),
        StructType(Seq(StructField("snapshot_id", LongType))),
        (t, args) => {
          val v = args(1).asInstanceOf[UTF8String].toString
          val snap = if (v.matches("-?\\d+")) t.rollbackTo(v.toLong)
                     else t.rollbackToTag(v)
          Array[Any](snap.id)
        }, p))
      case "create_tag" => Some(proc("create_tag",
        Seq(in("table", StringType), in("tag", StringType),
          in("snapshot_id", LongType, Some("-1"))),
        StructType(Seq(StructField("snapshot_id", LongType))),
        (t, args) => {
          val sid = args(2).asInstanceOf[Long]
          Array[Any](t.createTag(args(1).asInstanceOf[UTF8String].toString,
            if (sid < 0) None else Some(sid)))
        }, p))
      case "delete_tag" => Some(proc("delete_tag",
        Seq(in("table", StringType), in("tag", StringType)),
        StructType(Seq(StructField("deleted", BooleanType))),
        (t, args) => Array[Any](
          t.deleteTag(args(1).asInstanceOf[UTF8String].toString)), p))
      // write-audit-publish (Paimon branches): create_branch stages an
      // independent chain seeded from a tag/snapshot (head when omitted);
      // fast_forward publishes it onto main atomically; delete_branch is
      // the audit-failed path. Read a branch as `t$branch_<name>`.
      case "create_branch" => Some(proc("create_branch",
        Seq(in("table", StringType), in("branch", StringType),
          in("from", StringType, Some("''"))),
        StructType(Seq(StructField("seed_snapshot_id", LongType))),
        (t, args) => {
          val from = Option(args(2)).map(_.asInstanceOf[UTF8String].toString
            .trim).filter(_.nonEmpty)
          Array[Any](t.createBranch(
            args(1).asInstanceOf[UTF8String].toString, from))
        }, p))
      case "fast_forward" => Some(proc("fast_forward",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(StructField("head_snapshot_id", LongType))),
        (t, args) => Array[Any](
          t.fastForward(args(1).asInstanceOf[UTF8String].toString).id), p))
      case "delete_branch" => Some(proc("delete_branch",
        Seq(in("table", StringType), in("branch", StringType)),
        StructType(Seq(StructField("deleted", BooleanType))),
        (t, args) => {
          t.deleteBranch(args(1).asInstanceOf[UTF8String].toString)
          Array[Any](true)
        }, p))
      case "remove_orphan_files" => Some(proc("remove_orphan_files",
        Seq(in("table", StringType),
          in("older_than_ms", LongType, Some((24L * 3600 * 1000).toString))),
        // data files and swept metadata (unlinked delta manifests) report
        // separately — callers must not read manifest JSONs as data cleanup
        StructType(Seq(StructField("removed", IntegerType),
          StructField("removed_manifests", IntegerType))),
        (t, args) => {
          val data = t.removeOrphanFiles(args(1).asInstanceOf[Long])
          Array[Any](data, t.lastOrphanManifestsRemoved)
        }, p))
      // `bucket` is immutable through ALTER TABLE (a mixed-generation layout
      // would split a key's versions across bucket ids and break the
      // per-bucket merge) — rescale is the OFFLINE maintenance path, like
      // Paimon's: rewrite every live row into the new bucket count first
      // (an atomic compaction commit under the patched count), then persist
      // the option so subsequent writes stamp the new ids. Stop concurrent
      // writers first (the documented single-maintenance-job contract): a
      // write landing between the two steps would stamp old-count ids.
      case "rescale" => Some(procRaw("rescale",
        Seq(in("table", StringType), in("buckets", IntegerType)),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("buckets", IntegerType))),
        (c, db, name, args) => {
          val n = args(1).asInstanceOf[Int]
          Array[Any](c.rescale(db, name, n).id, n)
        }, p))
      case _ => None
    }
  }

  private def in(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One-row-result procedure over a `db.table` first argument. */
  private def proc(procName: String, params: Seq[ProcedureParameter],
      out: StructType, run: (StreamTable, Array[Any]) => Array[Any],
      catalog: => GraftCatalog): UnboundProcedure =
    procRaw(procName, params, out,
      (c, db, name, args) => run(c.getTable(db, name), args), catalog)

  /** Like [[proc]], but hands the CATALOG + identifier to the body (for
    * procedures that must re-derive the table mid-run, e.g. rescale). */
  private def procRaw(procName: String, params: Seq[ProcedureParameter],
      out: StructType, run: (GraftCatalog, String, String, Array[Any]) => Array[Any],
      catalog: => GraftCatalog): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft maintenance: $procName"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false // mutates table state
          override def call(input: InternalRow): JIterator[Scan] = {
            val args = params.indices.map(i =>
              input.get(i, params(i).dataType())).toArray
            val ident = args(0).asInstanceOf[UTF8String].toString
            val parts = ident.split("\\.", 2)
            require(parts.length == 2,
              s"$procName expects table => 'db.table', got '$ident'")
            val result = run(catalog, parts(0), parts(1), args)
            val row = new GenericInternalRow(result)
            Collections.singletonList(new LocalScan {
              override def readSchema(): StructType = out
              override def rows(): Array[InternalRow] = Array(row)
              override def description(): String = s"GraftProcedureResult $procName"
            }: Scan).iterator()
          }
        }
    }
}
