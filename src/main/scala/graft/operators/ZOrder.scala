package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write clustering (SURVEY.md §2.11a X21).
  *
  * A single-column sorted layout prunes scans on that column only: every
  * file spans the FULL range of every other column, so a predicate on a
  * second dimension reads the whole table. Interleaving the bits of two
  * (rank-normalized) columns into one z-value and range-partitioning +
  * sorting the write on it gives every file a bounded min/max box in
  * BOTH dimensions — parquet footer stats then skip files/row-groups for
  * predicates on either column (or a box on both). This is the layout
  * trick behind Delta/Iceberg `ZORDER BY`, built here from stock Spark
  * pieces: one metadata-scale agg for the bounds, pure bit-twiddling
  * column math (codegen'd, no UDF), `repartitionByRange` +
  * `sortWithinPartitions` — one range exchange, no global sort.
  *
  * At 100 TB: the bounds agg is a single cheap pass (or supplied from
  * table stats); the range exchange is the same shuffle any clustered
  * write pays; file count scales with data while each file's box stays
  * ~1/√F of each dimension — the property ZOrderSpec pins against the
  * single-column layout.
  */
object ZOrder {

  /** Low 16 bits of x spread to even positions 0,2,…,30 (classic
    * shift-or-mask cascade; LONG domain so no sign-bit surprises). */
  def spread16(x: Column): Column = {
    val a = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value interleaving two 16-bit ranks: x gets even bits,
    * y odd bits. */
  def interleave(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Rank-normalize a numeric column into [0, 65535] given its bounds
    * (min/max inclusive; degenerate range maps everything to 0). */
  def rank16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * 65536.0).cast("long"))

  /** The z-value for (cx, cy) with the given bounds. */
  def zvalue(cx: Column, xBounds: (Double, Double),
             cy: Column, yBounds: (Double, Double)): Column =
    interleave(rank16(cx, xBounds._1, xBounds._2),
               rank16(cy, yBounds._1, yBounds._2))

  /** `df` redistributed into `numFiles` z-ordered partitions on
    * (colX, colY): range-partitioned and sorted by z, ready for a
    * parquet write whose per-file stats box BOTH columns. Bounds come
    * from one metadata-scale agg over `df` (supply from table stats at
    * real scale by calling zvalue directly). */
  def cluster(df: DataFrame, colX: String, colY: String, numFiles: Int): DataFrame = {
    val r = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    if (r.isNullAt(0)) return df // empty input: nothing to cluster
    val z = zvalue(col(colX), (r.getDouble(0), r.getDouble(1)),
                   col(colY), (r.getDouble(2), r.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
