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
  * With `--zorder colA,colB` the rewrite is Paimon's *sort-compact*
  * (`compact --order_strategy zorder --order_by a,b`): the live set is
  * re-clustered along the 2-D z-curve instead of plain repartitioning.
  *
  * Usage: sbt "runMain graft.table.CompactJob <tableRoot> [targetFileCount]
  *   [primaryKey] [sequenceField] [--zorder colA,colB]"
  */
object CompactJob {
  def main(rawArgs: Array[String]): Unit = {
    val zorder = rawArgs.sliding(2).collectFirst {
      case Array("--zorder", cols) => cols.split(",").map(_.trim)
    }
    zorder.foreach(c => require(c.length == 2,
      s"--zorder needs exactly two columns, got '${c.mkString(",")}'"))
    val args = {
      val i = rawArgs.indexOf("--zorder")
      if (i < 0) rawArgs else rawArgs.patch(i, Nil, 2)
    }
    require(args.nonEmpty,
      "usage: CompactJob <tableRoot> [targetFileCount] [primaryKey] " +
        "[sequenceField] [--zorder colA,colB]")
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
    val snap = zorder match {
      case Some(Array(a, b)) => t.sortCompact(a, b, target)
      case _ => t.compact(target)
    }
    val after = Option(snap).map(_.files.size).getOrElse(0)
    val rows = Option(snap).map(_.files.map(_.rowCount).sum).getOrElse(0L)
    // the reference's observable: N small files → few large ones, rows
    // conserved (guide.md:212-231 → :258-259)
    println(s"""{"compacted":true,"files_before":$before,"files_after":$after,"rows":$rows,"zorder":${zorder.isDefined}}""")
    if (!preexisting) spark.stop()
  }
}
