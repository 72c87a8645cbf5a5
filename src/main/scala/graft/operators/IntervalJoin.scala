package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap join (SURVEY.md §2.3 J9, the generic path).
  *
  * The naive interval join `a.start < b.end && b.start < a.end` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin — O(n·m) compares
  * and a broadcast of one whole side. That is fine when one side is
  * tiny (q14 broadcasts derived quarters) and fatal when both sides are
  * large.
  *
  * This operator makes the join an EQUI-join: every interval is exploded
  * onto the coarse grid cells it touches (`sequence(floor(start/w),
  * floor(end/w))`), the join key is the cell id, and the overlap
  * predicate filters within cells. Two overlapping intervals share at
  * least the cell containing `max(start_a, start_b)` — and to emit each
  * pair EXACTLY once (overlapping intervals can share many cells) the
  * join keeps only that witness cell, so no global distinct is needed.
  *
  * Scale: shuffle is hash(cell) — fully parallel, skew bounded by how
  * many intervals touch one cell (pick `bucketWidth` ~ median interval
  * length; longer intervals replicate onto more cells, trading shuffle
  * volume for per-cell fan-in).
  */
object IntervalJoin {

  /** Overlap-join two interval tables on day-grid cells.
    * Inputs carry (idCols..., startCol, endCol) with DATE columns;
    * intervals are half-open [start, end). Returns one row per
    * overlapping (a, b) pair with all a-side and b-side columns
    * prefixed `a_` / `b_`. */
  def overlap(a: DataFrame, b: DataFrame,
              startCol: String, endCol: String,
              bucketWidthDays: Int): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    def cells(df: DataFrame): DataFrame = {
      val s = datediff(col(startCol), epoch)
      val e = datediff(col(endCol), epoch)
      // empty intervals ([s, e) with e <= s) overlap nothing; dropping
      // them also keeps the cell sequence ascending
      df.filter(s < e).withColumn("__cell",
        explode(sequence(floor(s / bucketWidthDays), floor((e - 1) / bucketWidthDays))))
        .withColumn("__sday", s)
        .withColumn("__eday", e)
    }
    val ca = cells(a).select(a.columns.map(c => col(c).as(s"a_$c")) ++
      Seq(col("__cell"), col("__sday").as("__a_s"), col("__eday").as("__a_e")): _*)
    val cb = cells(b).select(b.columns.map(c => col(c).as(s"b_$c")) ++
      Seq(col("__cell"), col("__sday").as("__b_s"), col("__eday").as("__b_e")): _*)
    ca.join(cb, Seq("__cell"))
      .filter(col("__a_s") < col("__b_e") && col("__b_s") < col("__a_e"))
      // witness cell: the one containing the later of the two starts —
      // emits each overlapping pair exactly once, no global distinct
      .filter(col("__cell") ===
        floor(greatest(col("__a_s"), col("__b_s")) / bucketWidthDays))
      .drop("__cell", "__a_s", "__a_e", "__b_s", "__b_e")
  }
}
