package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query from SURVEY.md §2.
  *
  * Contract (see SURVEY.md §5.2): `build` runs on Spark over the testdata
  * parquet dir; `oracle` (when present) is the DuckDB-SQL twin over the same
  * tables. Both must produce identical column names and a deterministic total
  * row order (every query ends in ORDER BY over a unique key set). Queries
  * whose semantics are approximate or not SQL-expressible set `oracle = None`
  * and are covered by ScalaTest instead (driver records rows-only check).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

object Q {
  /** Build a Q whose Spark side is also SQL, run via spark.sql after
    * registering testdata views — used when the Spark and DuckDB dialects
    * coincide and the DataFrame form would add nothing. */
  def sql(name: String, sparkSql: String, duckSql: String, doc: String = ""): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sparkSql) }, Some(duckSql), doc)
}
