package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.MinHashLSH

/** T14 — CONTINUOUS near-duplicate candidate detection over a document
  * stream (SURVEY.md §2.9 + §2.10 N10 composed): the batch MinHash-LSH
  * band join becomes a stateful bucket membership — each (band, key)
  * bucket remembers which doc ids it has seen, and a new arrival emits
  * a candidate pair against every remembered member. This is what the
  * batch operator cannot do: discover that a document arriving NOW
  * nearly duplicates one ingested three days ago, without re-running
  * LSH over the accumulated corpus per batch.
  *
  * Shape: a STATELESS projection computes the per-row banded signature
  * ([[MinHashLSH.bandedSignatureArr]] — one aggregate fold, md5 chain
  * evaluated once) and explodes it to (band, key, doc_id); then
  * `flatMapGroupsWithState` keyed on (band, key) holds the bucket
  * membership. State per bucket is CAPPED at `maxBucketSize` ids — the
  * batch viral-bucket device adapted to streams: a saturated bucket
  * stops admitting members and stops emitting pairs, so one
  * mass-duplicated boilerplate text can neither grow the state store
  * nor emit O(n²) pairs over the stream's lifetime. (Difference from
  * batch, by necessity: batch DROPS an over-cap bucket entirely —
  * retroactively, because it sees the full count first; a stream
  * cannot un-emit, so it TRUNCATES — the first `maxBucketSize` members
  * pair normally, later arrivals are counted in `dropped` and
  * suppressed. Under the cap the two emit identical candidate sets —
  * pinned in StreamingSpec.)
  *
  * Scale posture: state is hash-partitioned by (band, key) across
  * executors, sized at ≤ maxBucketSize longs per ACTIVE bucket; the
  * shuffle per micro-batch carries (band, key, doc_id) longs —
  * signature math rides the stateless projection, text never reaches
  * the state store. Output pairs can repeat across BANDS (batch
  * dedups with a global DISTINCT; a stream dedups downstream with the
  * T6 device — `dropDuplicates` over a watermark — when exactly-once
  * pairs matter).
  *
  * Candidates, not verified pairs: like the batch pipeline, a Jaccard
  * verify (stream-static join against the shingle store, or a batch
  * backfill) confirms candidates; LSH banding's false-positive rate is
  * the verify stage's input contract, unchanged from batch.
  */
object StreamingNearDup {

  case class DocBand(band: Int, key: Long, doc_id: Long)

  /** Bucket membership + saturation accounting. `ids` is insertion-
    * ordered (latest first); `dropped` counts suppressed arrivals after
    * saturation — nonzero dropped means mass duplication upstream
    * exact-dedup should have absorbed (the bucketStats contract). */
  case class BucketState(ids: List[Long], dropped: Long)

  case class CandidatePair(a_id: Long, b_id: Long, band: Int)

  /** Streaming candidate pairs over TEXT. `docs` must be a STREAMING
    * frame with (idCol: long, textCol: string); output is append-mode
    * candidate pairs (a_id < b_id, with the band that matched). */
  def candidates(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, numHashes: Int = 12,
                 bands: Int = 4, rows: Int = 3,
                 maxBucketSize: Int = MinHashLSH.DefaultMaxBucket)
      : Dataset[CandidatePair] =
    candidatesFromBands(
      docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(MinHashLSH.bandedSignatureArr(
          col(textCol), k, numHashes, bands, rows)).as(Seq("band", "key"))),
      maxBucketSize)

  /** Streaming candidate pairs over EMBEDDINGS — the same stateful
    * bucket membership, keyed by [[graft.operators.SignLSH]]'s
    * hyperplane-sign bucket (per-row column math, scale-invariant:
    * Charikar '02). One "band" (the full sign pattern), so pairs never
    * repeat; with b planes cosine-close vectors collide on all signs
    * exactly as in the batch q57 path. */
  def embeddingCandidates(docs: DataFrame, idCol: String, vecCol: String,
                          planes: Int = 8, dims: Int = 16,
                          maxBucketSize: Int = MinHashLSH.DefaultMaxBucket)
      : Dataset[CandidatePair] =
    candidatesFromBands(
      docs.select(col(idCol).cast("long").as("doc_id"),
        lit(0).as("band"),
        graft.operators.SignLSH.bucket(col(vecCol), planes, dims).as("key")),
      maxBucketSize)

  /** The stateful stage, for any (doc_id, band, key) banding scheme. */
  def candidatesFromBands(banded: DataFrame, maxBucketSize: Int)
      : Dataset[CandidatePair] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .as[(Long, Int, Long)]
      .map { case (id, band, key) => DocBand(band, key, id) }
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(maxBucketSize))
  }

  private def update(maxBucketSize: Int)(
      bucket: (Int, Long), rows: Iterator[DocBand],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    val prev = state.getOption.getOrElse(BucketState(Nil, 0L))
    // ids sorted within the batch: emission order (and the pair set
    // under saturation) must not depend on partition-internal row order
    val arrivals = rows.map(_.doc_id).toArray.distinct.sorted
      .filterNot(prev.ids.contains)
    var ids = prev.ids
    var dropped = prev.dropped
    val out = Vector.newBuilder[CandidatePair]
    arrivals.foreach { id =>
      if (ids.length < maxBucketSize) {
        ids.foreach { o =>
          out += CandidatePair(math.min(o, id), math.max(o, id), bucket._1)
        }
        ids = id :: ids
      } else dropped += 1
    }
    state.update(BucketState(ids, dropped))
    out.result().iterator
  }
}
