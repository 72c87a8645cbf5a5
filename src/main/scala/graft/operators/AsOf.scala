package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J8): for each left row, attach the most
  * recent right row with right.ts <= left.ts sharing the same keys.
  *
  * Spark has no native as-of primitive; the naive range join explodes to
  * O(n*m) pairs per key. This implementation unions both sides tagged,
  * sorts once per key on (ts, side, tie), and carries the right side's
  * values forward with last_value(ignore nulls) — ONE shuffle on the
  * keys, O(n+m) rows, no pair explosion. This is the formulation that
  * survives a 100x scale-up: the window is per-key, so skew only arises
  * from genuinely hot keys (salt upstream if needed).
  *
  * Tie semantics: right rows at ts == left.ts ARE visible (<=); among
  * right rows with identical ts the one with the largest `tieBreak`
  * wins — fully deterministic, matching the DuckDB oracle twin.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
           tieBreak: String = "event_id"): DataFrame = {
    val leftOther = left.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == ts).toSeq

    def nullAs(src: DataFrame, c: String, as: String): Column =
      lit(null).cast(src.schema(c).dataType).as(as)

    // All right-side payload travels as ONE struct so the window fill can
    // never tear: a right row whose value column is NULL must still win as
    // a whole (asof_ts and every asof_* from the SAME row), which per-column
    // last(ignoreNulls) would violate by reaching further back for the null
    // column only.
    val asofStruct = struct(
      col(ts).as("asof_ts") +: rightVals.map(c => col(c).as(s"asof_$c")): _*)
    val asofType = right.select(asofStruct.as("__asof")).schema.head.dataType

    val lPart = left.select(
      keys.map(col) ++ Seq(
        col(ts),
        lit(1).as("__is_left"),
        col(tieBreak).as("__tie")) ++
      leftOther.map(col) :+
      lit(null).cast(asofType).as("__asof"): _*)

    val rPart = right.select(
      keys.map(col) ++ Seq(
        col(ts),
        lit(0).as("__is_left"),
        col(tieBreak).as("__tie")) ++
      leftOther.map(c => nullAs(left, c, c)) :+
      asofStruct.as("__asof"): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col("__is_left"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val asofCols = "asof_ts" +: rightVals.map(c => s"asof_$c")
    lPart.unionByName(rPart)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(col("*") +: asofCols.map(c => col(s"__asof.$c").as(c)): _*)
      .drop("__is_left", "__tie", "__asof")
  }
}
