package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2B) lives as a [[QDef]] in one of the
  * `graft.ops` / `graft.streaming` registries: the Spark program and its
  * DuckDB-oracle SQL side by side. This object only assembles them.
  */
object SparkEntry {

  /** All declared queries, in registry order. */
  def registry: Seq[QDef] =
    Scans.all ++ Joins.all ++ Aggs.all ++ Windows.all ++ SetOps.all ++
      Funcs.all ++ Udfs.all ++ Analytical.all ++ Tpch.all ++ Ext.all ++ Pipeline.all ++
      Curation.all ++ Timeseries.all ++ Tokenize.all ++ Retrieval.all ++
      SparkNative.all ++
      graft.multimodal.Multimodal.all ++ graft.sources.Datagen.all ++
      graft.sources.v2.V2Queries.all ++
      graft.streaming.StreamOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature operation: the enrichment lookup join
    * (tutorial/guide.md:119-140) as a broadcast equi-join. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q_join_broadcast_lookup").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
