package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE INTO — the warehouse upsert primitive (`MERGE INTO
  * target USING source ON key WHEN MATCHED [AND delete] THEN
  * DELETE/UPDATE WHEN NOT MATCHED THEN INSERT`), expressed as ONE
  * full-outer join + per-column resolution, no table format required:
  *
  *   - target row, no source row  → passes through unchanged
  *   - source row, no target row  → inserted (unless delete-flagged)
  *   - both                       → source's update columns win,
  *                                  target's other columns survive;
  *                                  a delete-flagged source removes it
  *
  * Scale shape: exactly one shuffle per side on the merge key (the
  * full-outer join); column resolution is a codegen'd projection. The
  * anti-join+union formulation (`IndexSink.upsert`, S11) is the
  *
  * whole-row-replace special case; this one supports partial-column
  * updates and deletes, which is what a dimension-maintenance MERGE
  * actually needs.
  *
  * Precondition (same as SQL MERGE): `source` is key-unique — more
  * than one source row per key makes the SQL statement itself
  * nondeterministic, so callers dedupe upstream.
  */
object MergeInto {

  /** @param updateCols the non-key columns a matched source row
    *   overwrites; every other target column is retained
    * @param deleteCol optional boolean column on `source`; true =
    *   remove the matched target row (and never insert the source row)
    */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
            updateCols: Seq[String], deleteCol: Option[String] = None): DataFrame = {
    val tCols = target.columns.toSeq
    val del = deleteCol.map(c => coalesce(col(s"__s.$c"), lit(false)))
      .getOrElse(lit(false))
    // Source presence must be a MARKER column, not a value test:
    // coalesce(src.col, tgt.col) would make `UPDATE SET col = NULL`
    // silently keep the target value — SQL MERGE takes the source's
    // update columns verbatim, NULLs included. The lit(true) marker is
    // null exactly on target-only rows of the full-outer join.
    val srcPresent = col("__s.__sp").isNotNull
    val matchedOrInsert = tCols.map { c =>
      if (keyCols.contains(c) || updateCols.contains(c))
        when(srcPresent, col(s"__s.$c")).otherwise(col(s"__t.$c")).as(c)
      else col(s"__t.$c").as(c) // nulls stay null for pure inserts
    }
    val joined = target.alias("__t").join(
      source.withColumn("__sp", lit(true)).alias("__s"),
      keyCols.map(k => col(s"__t.$k") === col(s"__s.$k")).reduce(_ && _),
      "full_outer")
    joined
      .filter(!del)
      .select(matchedOrInsert: _*)
  }
}
