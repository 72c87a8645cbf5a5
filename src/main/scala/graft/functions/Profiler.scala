package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Single-pass column profiler — the data-quality primitive a training
  * pipeline runs before ingesting a new 100 TB drop: per column, null
  * count, exact distinct count, min and max.
  *
  * One aggregation computes every metric for every column (one scan,
  * one shuffle of partial states), then `stack` unpivots the single
  * metrics row into one row per column. min/max are computed in the
  * column's native type and only RENDERED as strings, so numeric
  * columns profile numerically (string-min of ints would be
  * lexicographic).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast(StringType).as(s"${c}__min"),
      max(col(c)).cast(StringType).as(s"${c}__max")))
    val metricsRow = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    metricsRow.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_str, max_str)")
  }
}
