package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.IndexSegmentMerge

/** Streaming POSTINGS maintenance (SURVEY.md §2.9 T31): the inverted
  * index's streaming member — each micro-batch of NEW documents builds
  * a small compressed DELTA segment ([[graft.queries.Text.postingStore]],
  * q258's layout), probes read the segment LIST, and every
  * [[CompactEvery]] batches the segments fold into one with
  * [[IndexSegmentMerge]] — Lucene's ingest shape (per-commit segments
  * + background merges), and the posting-store member of the
  * T21/T23/T26 append-then-compact family.
  *
  * Exactly-once under at-least-once delivery: a replayed document
  * would violate q264's overlap law (the same doc id in two segments
  * double-counts a posting), so the batch dedups against the
  * accumulated seen-id set FIRST (anti-join, the T26 discipline; the
  * seen set is compacted on the same cadence so its plan stays
  * bounded). A replay therefore contributes an EMPTY delta — a
  * structural no-op, no segment minted.
  *
  * Laws (spec-pinned, StreamingSpec T31): segment count never exceeds
  * CompactEvery; after a forced final compaction the single segment
  * equals the BATCH [[graft.queries.Text.postingStore]] over every
  * document ever delivered, BYTE FOR BYTE (q264's merged ≡ rebuilt law
  * chained across the whole stream); replays are no-ops.
  *
  * Scale: per batch O(|delta| explode + delta-sized block encode);
  * the compaction is q264's one compact-key shuffle over the bounded
  * segment list, paid every CompactEvery batches, never per batch.
  */
object StreamingPostings {

  /** Compaction cadence — also the segment-list bound. */
  val CompactEvery = 4

  final case class PsState(segments: List[DataFrame], seenIds: DataFrame,
                           batches: Int = 0)

  def freeze(spark: org.apache.spark.sql.SparkSession): PsState = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
    PsState(Nil, empty)
  }

  /** Apply one micro-batch of `(doc_id, text)` documents. */
  def applyBatch(state: PsState, delta: DataFrame): PsState = {
    // T26 discipline: only never-seen docs mint postings
    val fresh = delta
      .select(col(delta.columns.head).cast("long").as("doc_id"),
        col(delta.columns(1)).as("text"))
      .dropDuplicates("doc_id")
      .join(state.seenIds, Seq("doc_id"), "left_anti")
      .barrier()
    val nBatches = state.batches + 1
    val segs =
      if (fresh.isEmpty) state.segments
      else graft.queries.Text.postingStore(fresh).barrier() ::
        state.segments
    val seenUnion = state.seenIds.unionByName(fresh.select(col("doc_id")))
    val seen =
      if (nBatches % CompactEvery == 0) seenUnion.distinct().barrier()
      else seenUnion
    val compacted =
      if (segs.lengthCompare(1) > 0 && nBatches % CompactEvery == 0)
        List(compact(segs))
      else segs
    PsState(compacted, seen, nBatches)
  }

  /** Fold the whole segment list into one (the background merge; also
    * the spec's forced final compaction). */
  def compact(segments: List[DataFrame]): DataFrame = segments match {
    case Nil => sys.error("compact: no segments")
    case one :: Nil => one
    case head :: rest =>
      rest.foldLeft(head)(IndexSegmentMerge.merge).barrier()
  }
}
