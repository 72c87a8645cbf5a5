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
  * nondeterministic, so callers dedupe upstream. The precondition is
  * ENFORCED, not trusted: a `count() over (partition by key)` window
  * on the source feeds `raise_error` on any duplicate, so a violating
  * merge fails loudly at execution instead of silently multiplying
  * target rows. The guard is free of extra shuffles — the window
  * hash-partitions the source on exactly the keys the full-outer join
  * requires, so Catalyst reuses the one exchange the join was going to
  * perform anyway (cost: one extra in-partition sort on the small
  * side).
  */
object MergeInto {

  /** @param updateCols the non-key columns a matched source row
    *   overwrites; every other target column is retained
    * @param deleteCol optional boolean column on `source`; true =
    *   remove the matched target row (and never insert the source row)
    */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
            updateCols: Seq[String], deleteCol: Option[String] = None): DataFrame = {
    // The presence marker is added with withColumn, which would silently
    // REPLACE a caller's column of the same name and corrupt the merge —
    // reject the collision loudly instead.
    val reserved = Seq("__sp", "__kc")
    require(!source.columns.exists(reserved.contains),
      s"MergeInto: source must not contain reserved columns ${reserved.mkString("/")}")
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
    // Key-uniqueness guard: rides the join's own hash partitioning.
    // raise_error evaluates lazily per row, so a key-unique source
    // never pays more than the count itself.
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    // NULL-key rows are EXEMPT from the guard: the join's null-unsafe
    // equality never matches them to anything, so each is a plain
    // insert — deterministic under SQL MERGE even when several share
    // the NULL key (the window would lump them into one group and
    // falsely reject).
    val keysNonNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val guarded = source
      .withColumn("__kc", count(lit(1)).over(wk))
      .withColumn("__sp",
        when(keysNonNull && col("__kc") > 1, raise_error(concat(
          lit(s"MergeInto: source is not key-unique on (${keyCols.mkString(", ")}): key ("),
          concat_ws(", ", keyCols.map(k => col(k).cast("string")): _*),
          lit(") occurs "), col("__kc").cast("string"), lit(" times"))))
          .otherwise(lit(true)))
      .drop("__kc")
    val joined = target.alias("__t").join(
      guarded.alias("__s"),
      keyCols.map(k => col(s"__t.$k") === col(s"__s.$k")).reduce(_ && _),
      "full_outer")
    joined
      .filter(!del)
      .select(matchedOrInsert: _*)
  }
}
