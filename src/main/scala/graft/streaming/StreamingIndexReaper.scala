package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.{GenerationRollover, IvfPqIndex}

/** Streaming INDEX reaper (SURVEY.md §2.9 T30): the q249 index
  * generation rollover driven from inside the takedown stream — the
  * [[StreamingReaper]]'s sibling for the serving index store, closing
  * the streaming-reaper symmetry (packing: T29; index: HERE; the graph
  * member stays batch-only by declaration — its rollover is a
  * from-scratch NN-Descent build, q250, not an in-stream operation).
  *
  * Per micro-batch, the T26 discipline: arriving ids anti-join the
  * accumulated tombstone set (at-least-once delivery degrades to
  * exactly-once stats arithmetic), the delta's index rows produce
  * per-cell deleted INCREMENTS merged into the running cell-occupancy
  * stats, and the tombstone union compacts every
  * [[StreamingTakedown.CompactEvery]] batches. The INDEX frame itself
  * stays FROZEN between rolls — serving reads it under the tombstone
  * filter, so per-batch work is O(|delta| + cells) and the plan never
  * grows an anti-join chain. Then the reaper's poll:
  * [[IvfPqIndex.deadFractionPpm]] over the updated cells-sized stats
  * (one 1-row aggregate per batch, the sanctioned class). Crossing
  * the threshold rolls the generation MID-STREAM: ONE anti-join of
  * the accumulated tombstones against the frozen frame, barriered —
  * generation G+1. Because index rows are pointwise under the frozen
  * model, maintained ≡ rebuilt (q234/q249's law): the roll reclaims
  * tombstone space without changing one serving answer, and no
  * translation map is needed (index rows are keyed by vec_id, not by
  * physical offset — the packing reaper's re-key machinery has no
  * index counterpart BY CONSTRUCTION, which is the design argument
  * for id-keyed serving stores).
  *
  * Replays across generation boundaries are structural no-ops without
  * cross-generation dedup state: a replayed id reaped in an earlier
  * generation has no rows in the current frame, so its cell increment
  * is zero rows and its tombstone never matches a survivor
  * (spec-pinned, the T29 argument verbatim).
  *
  * Law (StreamingSpec T30): after any batch split with any number of
  * mid-stream rolls plus a forced final roll, the serving frame ==
  * `IvfPqIndex.removeFromIndex(index0, union of ALL deltas)._1` row
  * for row — generation-count independence — and the re-frozen stats
  * are the final generation's all-live occupancy. */
object StreamingIndexReaper {

  final case class IxState(index: DataFrame, tombstones: DataFrame,
                           cellStats: DataFrame, generation: Int,
                           batches: Int = 0)

  private def emptyIds(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType))))
  }

  private def freshStats(index: DataFrame): DataFrame =
    index.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_live"), lit(0L).as("n_deleted"))
      .barrier()

  /** Freeze generation 0 from a (vec_id, cell, ...) index frame. */
  def freeze(index: DataFrame): IxState = {
    val ix = index.barrier()
    IxState(ix, emptyIds(ix), freshStats(ix), 0)
  }

  /** Apply one micro-batch of `(vec_id)` takedown requests; roll the
    * generation if the dead-row fraction crossed `thresholdPpm`. */
  def applyBatch(state: IxState, delta: DataFrame,
                 thresholdPpm: Long = GenerationRollover.ThresholdPpm)
      : IxState = {
    val fresh = delta
      .select(col(delta.columns.head).cast("long").as("vec_id"))
      .distinct()
      .join(state.tombstones, Seq("vec_id"), "left_anti")
      .barrier()
    val cellInc = state.index.join(fresh, Seq("vec_id"))
      .groupBy(col("cell")).agg(count(lit(1)).as("__dc"))
    val stats = state.cellStats.join(cellInc, Seq("cell"), "left_outer")
      .select(col("cell"),
        (col("n_live") - coalesce(col("__dc"), lit(0L))).as("n_live"),
        (col("n_deleted") + coalesce(col("__dc"), lit(0L))).as("n_deleted"))
      .barrier()
    val union = state.tombstones.unionByName(fresh)
    val nBatches = state.batches + 1
    val tombstones =
      if (nBatches % StreamingTakedown.CompactEvery == 0)
        union.distinct().barrier()
      else union
    val applied =
      IxState(state.index, tombstones, stats, state.generation, nBatches)
    if (IvfPqIndex.deadFractionPpm(stats) >= thresholdPpm) roll(applied)
    else applied
  }

  /** Roll NOW: one anti-join of the accumulated tombstones against the
    * frozen frame (maintained ≡ rebuilt under the frozen model —
    * q234/q249's law — so serving answers are unchanged), barrier the
    * new generation, re-freeze stats all-live. */
  def roll(state: IxState): IxState = {
    val g1 = state.index
      .join(state.tombstones, Seq("vec_id"), "left_anti")
      .barrier()
    IxState(g1, emptyIds(g1), freshStats(g1), state.generation + 1,
      state.batches)
  }
}
