package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.queries.Text

/** Streaming side of sequence packing (SURVEY.md §2.9 T21 / §2.11a
  * N45/X93): micro-batches of documents append to an ALREADY-PACKED
  * corpus without remapping one frozen bin — the foreachBatch spelling
  * of q213's maintenance contract, and the T12 materialized-view
  * posture (the running state folds each DELTA in; no micro-batch ever
  * re-reads history).
  *
  * Semantics: bin assignment follows ARRIVAL order — doc_id order
  * inside a micro-batch (PrefixScan's deterministic sort), batch order
  * across micro-batches. That is the contract of every streaming
  * packer (the append log IS the order); identical ingest → identical
  * bins, which StreamingSpec T21 pins against the batch map.
  *
  * State per batch: the accumulated map (append-only — in production a
  * sink table partition per batch; here a frame) and the 1-row running
  * token total. Both are barriered each fold so state never retains
  * micro-batch lineage (T12's localCheckpoint posture; honors
  * `spark.graft.reliableCheckpoints`). Exactly-once lands on the
  * foreachBatch idempotency contract: writes keyed by batchId are
  * replay-safe (T10's pin).
  */
object StreamingPacking {

  /** Accumulated packing map (a union of per-batch BARRIERED leaves —
    * never itself checkpointed: checkpointing a union of checkpointed
    * frames trips Spark's union-constraint rewrite, and a union of
    * materialized leaves needs no lineage cut anyway) plus the running
    * token total as DRIVER state. The total is the one sanctioned
    * reduced aggregate here (a single scalar per micro-batch — the
    * BpeVocab-argmax precedent); it IS the operator's state, exactly
    * what a stateful streaming op would keep per key. */
  final case class PackState(map: DataFrame, total: Long)

  /** Empty state for a session: no segments, zero offset. The empty
    * map is a bare LocalRelation with the packing schema — NOT an
    * empty packingMap plan, whose constraint set would ride along
    * into every later union. */
  def empty(s: org.apache.spark.sql.SparkSession): PackState = {
    import s.implicits._
    val schema = Text.packingMap(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), L = 128).schema
    PackState(
      map = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema),
      total = 0L)
  }

  /** Fold one micro-batch of `(doc_id, text)` documents into the
    * state: pack the delta against the frozen total (bin ids continue
    * where the prefix stopped — the boundary bin keeps filling), then
    * advance the total by the delta's token count. In production the
    * barriered segment frame is what gets appended to the sink table
    * (keyed by batchId for replay-safe exactly-once — T10's pin). */
  def appendBatch(state: PackState, delta: DataFrame, L: Int): PackState = {
    val s = delta.sparkSession
    import s.implicits._
    // cut the micro-batch source out of the plan FIRST: PrefixScan's
    // window + the offset join then resolve against a plain batch plan,
    // not the foreachBatch-injected source
    val cut = delta.select(col("doc_id"), col("text")).barrier()
    val newSegs = Text.packingMap(cut, L,
        offset = Some(Seq(state.total).toDF("off")))
      .barrier()
    val deltaToks = newSegs.agg(coalesce(sum(col("seg_len")), lit(0L)))
      .head().getLong(0)
    PackState(state.map.unionByName(newSegs), state.total + deltaToks)
  }
}
