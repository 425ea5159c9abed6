package graft.table

import org.apache.spark.sql.SparkSession

/** Standalone offline compaction job — the Spark-native analog of the
  * reference's maintenance entry point
  * (`flink run … paimon-flink-action-….jar compact --path <table>`,
  * /root/reference/tutorial/guide.md:172-177, 2A#16 / §3 entry point 3):
  * a separate batch process that merges a live table's small files and
  * atomically swaps the manifest while any streaming writer keeps appending
  * (safe under the snapshot-commit protocol; the concurrent
  * writer+compactor case is stress-tested in StreamTableSpec).
  *
  * Usage: sbt "runMain graft.table.CompactJob <tableRoot> [targetFileCount]
  *   [primaryKey] [sequenceField]"
  */
object CompactJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CompactJob <tableRoot> [targetFileCount] [primaryKey] [sequenceField]")
    val root = args(0)
    val target = args.lift(1).map(_.toInt).getOrElse(2)
    val pk = args.lift(2).map(_.split(",").map(_.trim).toSeq)
    val seq = args.lift(3)

    // reuse an existing session when driven in-process (tests); only a
    // session this job itself created is stopped at the end
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = new StreamTable(root, spark, primaryKey = pk, seqCol = seq)
    val beforeSnap = t.latestSnapshot
    val before = beforeSnap.map(_.files.size).getOrElse(0)
    // Conservation is enforced INSIDE compact() against the rewrite's own
    // file metadata (input footer rows vs output footer rows), so the check
    // holds even while a concurrent streaming writer keeps committing —
    // re-counting the live table here would race those commits.
    val snap = t.compact(target)
    val after = Option(snap).map(_.files.size).getOrElse(0)
    val rows = Option(snap).map(_.files.map(_.rowCount).sum).getOrElse(0L)
    // the reference's observable: N small files → few large ones, rows
    // conserved (guide.md:212-231 → :258-259)
    println(s"""{"compacted":true,"files_before":$before,"files_after":$after,"rows":$rows}""")
    if (!preexisting) spark.stop()
  }
}
