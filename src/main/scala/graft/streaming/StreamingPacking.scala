package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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

  /** Compact the accumulated map every this-many micro-batches, so the
    * union plan never holds more than this many leaves (ADVICE r9: one
    * unionByName node per batch otherwise deepens the plan unboundedly
    * over a long-running stream — per-batch analysis/planning cost
    * would grow linearly with batch count). */
  val CompactEvery = 8

  /** Accumulated packing map (a union of per-batch BARRIERED leaves —
    * never itself Dataset-checkpointed: checkpointing a union of
    * checkpointed frames trips Spark's union-constraint rewrite;
    * instead every [[CompactEvery]] batches the union is collapsed to a
    * single leaf at the RDD level, see [[cutLeaf]]) plus the running
    * token total and fold count as DRIVER state. The total is the one
    * sanctioned reduced aggregate here (a single scalar per
    * micro-batch — the BpeVocab-argmax precedent); it IS the operator's
    * state, exactly what a stateful streaming op would keep per key.
    *
    * `leaves` tracks the persisted RDD behind every LIVE leaf of `map`
    * (r11 ADVICE: superseded leaves must be UNPERSISTED at compaction,
    * or executor storage grows with batch count on exactly the
    * long-running streams compaction targets). At most [[CompactEvery]]
    * entries by construction. In reliable mode, unpersist frees the
    * cached blocks; the durable CHECKPOINT FILES remain until the
    * SparkContext cleans them up at stop — a bounded residue (one file
    * set per compaction epoch) that production streams reap with a
    * checkpoint-dir retention policy, same as any structured-streaming
    * state store. */
  final case class PackState(map: DataFrame, total: Long, batches: Long = 0L,
      leaves: Seq[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = Nil)

  /** Materialize `df` into one persisted LogicalRDD leaf and return the
    * frame plus the persisted RDD behind it (so the caller can
    * unpersist it when a later compaction supersedes the leaf). The
    * union-of-checkpointed-frames constraint-rewrite bug lives in the
    * DATASET checkpoint path, so the cut happens one level down: take
    * the planned RDD, cut ITS lineage with the same local/reliable
    * choice as `Barriers.barrier()`, and rewrap. The result's logical
    * plan is a single leaf regardless of how many batches were folded. */
  private def cutLeaf(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val s = df.sparkSession
    val rows = df.rdd
    val reliable =
      s.conf.getOption(graft.core.Barriers.ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"${graft.core.Barriers.ReliableKey}=true but no checkpoint dir")
      rows.cache().checkpoint()
    } else rows.localCheckpoint()
    val out = s.createDataFrame(rows, df.schema)
    out.count() // materialize the cut eagerly, like barrier(eager = true)
    (out, rows)
  }

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
    val (cut, cutRdd) = cutLeaf(delta.select(col("doc_id"), col("text")))
    val (newSegs, segRdd) = cutLeaf(Text.packingMap(cut, L,
      offset = Some(Seq(state.total).toDF("off"))))
    // the cut delta fed ONLY the now-materialized segment leaf — its
    // blocks are dead the moment cutLeaf returns (r11 ADVICE)
    cutRdd.unpersist(blocking = false)
    val deltaToks = newSegs.agg(coalesce(sum(col("seg_len")), lit(0L)))
      .head().getLong(0)
    val grown = state.map.unionByName(newSegs)
    val folds = state.batches + 1
    if (folds % CompactEvery == 0) {
      val (mapDf, mapRdd) = cutLeaf(grown)
      // every pre-compaction leaf now lives inside the compacted leaf;
      // free the superseded blocks so storage is bounded by ONE map
      // copy + at most CompactEvery per-batch leaves, not batch count
      (state.leaves :+ segRdd).foreach(_.unpersist(blocking = false))
      PackState(mapDf, state.total + deltaToks, folds, Seq(mapRdd))
    } else
      PackState(grown, state.total + deltaToks, folds, state.leaves :+ segRdd)
  }
}
