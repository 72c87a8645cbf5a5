package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.core.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in graft.queries.* as Q values; this object only
  * flattens the registry into the driver's two maps.
  */
object SparkEntry {

  /** Every declared operator query (SURVEY.md §2 inventory). */
  def registry: Seq[Q] =
    _root_.graft.queries.Relational.all ++
    _root_.graft.queries.Joins.all ++
    _root_.graft.queries.Aggregates.all ++
    _root_.graft.queries.Windows.all ++
    _root_.graft.queries.SetsSorts.all ++
    _root_.graft.queries.Scalars.all ++
    _root_.graft.queries.Text.all ++
    _root_.graft.queries.Vectors.all ++
    _root_.graft.queries.Dedup.all ++
    _root_.graft.queries.Sources.all ++
    _root_.graft.queries.Multimodal.all ++
    _root_.graft.queries.Extended.all ++
    _root_.graft.queries.Analytics.all ++
    _root_.graft.queries.Workload.all ++
    _root_.graft.queries.Curation.all ++
    _root_.graft.queries.Mining.all ++
    _root_.graft.queries.Retrieval.all ++
    _root_.graft.queries.Selection.all ++
    _root_.graft.queries.Inference.all ++
    _root_.graft.queries.Pipeline.all ++
    _root_.graft.queries.Bpe.all ++
    _root_.graft.queries.Tweets.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.q01.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
