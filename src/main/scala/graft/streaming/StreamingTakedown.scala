package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Streaming takedown application (SURVEY.md §2.9 T26): a stream of
  * right-to-be-forgotten requests applied to the FROZEN corpus
  * artifacts — the maintenance family's DELETE member in streaming
  * form (append twins: T21 packing, T23 index; batch DELETE members:
  * q233 packing ledger, q234 index takedown).
  *
  * Per micro-batch, O(|delta| + touched state):
  *  - incoming ids are deduplicated against the accumulated tombstone
  *    set (an anti-join), so at-least-once delivery — stream retries,
  *    replayed requests — degrades to exactly-once ledger arithmetic;
  *  - the delta's packing-map rows produce per-bin freed INCREMENTS
  *    (one aggregate over delta rows only), merged into the running
  *    per-bin ledger by a bin-keyed join — bins never touched by any
  *    takedown are never rewritten;
  *  - the delta's index rows produce per-cell deleted increments for
  *    the running cell-occupancy stats (q234's serving update).
  *
  * The packing map and index are scanned per batch only to LOOK UP the
  * delta's rows (broadcast-sized probe against the frozen frame; at
  * cluster scale the map is bucketed by doc_id so the lookup prunes).
  * Tombstones accumulate as a plain union of barriered per-batch
  * leaves (the r9 union-checkpoint lesson), and every
  * [[CompactEvery]] batches the union is aggregate-topped and
  * re-barriered (`distinct().barrier()` — legal because the barrier
  * sits on an aggregate, never a bare Union; GraphAnn.beamSearch is
  * the in-repo precedent). Without the compaction a long-lived
  * takedown stream — months of trickle, the realistic deployment —
  * grows one plan leaf per batch: O(N) plan nodes at batch N, O(N²)
  * cumulative analysis cost, and eventually a driver planning stall.
  * With it the tombstone plan is bounded at CompactEvery+1 leaves
  * regardless of stream lifetime; the ledgers are aggregate-topped
  * and barrier per batch as before.
  *
  * Law (StreamingSpec T26): after any batch split, ledger ==
  * `Text.packingTakedown(map, union of deltas)` and cell stats ==
  * `IvfPqIndex.removeFromIndex(index, union).  _2` — streamed ≡ batch,
  * the q213/q222 discipline in reverse.
  */
object StreamingTakedown {

  /** Tombstone-union compaction period (in micro-batches). */
  val CompactEvery = 8

  final case class TState(map: DataFrame, index: DataFrame,
                          tombstones: DataFrame, ledger: DataFrame,
                          cellStats: DataFrame, batches: Int = 0)

  /** Freeze the packed corpus + index; ledgers start all-live. */
  def freeze(map: DataFrame, index: DataFrame): TState = {
    val m = map.barrier()
    val ix = index.barrier()
    val ledger = m.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_live"), lit(0L).as("n_freed"),
        sum(col("seg_len")).as("live_tokens"), lit(0L).as("freed_tokens"))
      .barrier()
    val cells = ix.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_live"), lit(0L).as("n_deleted"))
      .barrier()
    val s = map.sparkSession
    val empty = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
    TState(m, ix, empty, ledger, cells)
  }

  /** Apply one micro-batch of `(doc_id)` takedown requests. */
  def applyBatch(state: TState, delta: DataFrame): TState = {
    // exactly-once under replays: only never-seen ids take effect
    val fresh = delta.select(col("doc_id").cast("long").as("doc_id"))
      .distinct()
      .join(state.tombstones, Seq("doc_id"), "left_anti")
      .barrier()
    // per-bin freed increments from the delta's map rows only
    val binInc = state.map.join(fresh, Seq("doc_id"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("__df"), sum(col("seg_len")).as("__dt"))
    val ledger = state.ledger.join(binInc, Seq("bin_id"), "left_outer")
      .select(col("bin_id"),
        (col("n_live") - coalesce(col("__df"), lit(0L))).as("n_live"),
        (col("n_freed") + coalesce(col("__df"), lit(0L))).as("n_freed"),
        (col("live_tokens") - coalesce(col("__dt"), lit(0L))).as("live_tokens"),
        (col("freed_tokens") + coalesce(col("__dt"), lit(0L))).as("freed_tokens"))
      .barrier()
    // per-cell deleted increments from the delta's index rows only
    val cellInc = state.index.join(
        fresh.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      .groupBy(col("cell")).agg(count(lit(1)).as("__dc"))
    val cells = state.cellStats.join(cellInc, Seq("cell"), "left_outer")
      .select(col("cell"),
        (col("n_live") - coalesce(col("__dc"), lit(0L))).as("n_live"),
        (col("n_deleted") + coalesce(col("__dc"), lit(0L))).as("n_deleted"))
      .barrier()
    // plain union of barriered leaves — never checkpoint the union.
    // Every CompactEvery batches, top the union with an aggregate and
    // barrier THAT (distinct is a no-op on the data: fresh is already
    // anti-joined against tombstones, so rows are unique) — bounds the
    // tombstone plan at CompactEvery+1 leaves over any stream lifetime.
    val union = state.tombstones.unionByName(fresh)
    val nBatches = state.batches + 1
    val tombstones =
      if (nBatches % CompactEvery == 0) union.distinct().barrier()
      else union
    TState(state.map, state.index, tombstones, ledger, cells, nBatches)
  }
}
