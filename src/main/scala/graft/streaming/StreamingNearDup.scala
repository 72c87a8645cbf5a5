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
  * the verify stage's input contract, unchanged from batch
  * ([[StreamingVerifiedDedup]] composes exactly that).
  *
  * State lifetime — DEFAULT TO BOUNDED RETENTION in production (r8
  * verdict item 9):
  *  - [[candidatesWithRetention]] — the production posture. Bounded
  *    state via event-time timeouts: a bucket idle past `retention`
  *    (no member arrivals, event time) is EVICTED when the watermark
  *    passes, so the state store's size follows the ACTIVE content
  *    window, not the stream's lifetime. The trade, stated loudly: an
  *    evicted bucket re-seeds empty, so a near-copy arriving after
  *    the gap does NOT pair with pre-eviction members (bounded recall
  *    loss — the deduplicate-against-the-last-N-days contract; size
  *    `retention` to the dedup window your pipeline promises); pairs
  *    already emitted are never retracted. The production example:
  *
  *    {{{
  *    StreamingNearDup.candidatesWithRetention(
  *        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
  *          .json(landingDir),
  *        "doc_id", "text", "ts", retention = java.time.Duration.ofDays(30))
  *      .writeStream.format("parquet").option("path", pairsDir)
  *      .option("checkpointLocation", ckDir).start()
  *    }}}
  *
  *    (compiled and driven — incl. across checkpoint restarts — in
  *    StreamingSpec's T14c cases.)
  *  - [[candidates]]/[[embeddingCandidates]] — remember-all-history,
  *    for finite backfills and dedup-against-everything audits.
  *    Per-bucket state is capped, but the bucket COUNT grows with all
  *    distinct content ever streamed — unbounded over an infinite
  *    stream BY DESIGN (a doc can pair with one ingested months ago).
  *    A deployment that outlives its state store must restart/compact
  *    the query or switch to the retention mode.
  */
object StreamingNearDup {

  case class DocBand(band: Int, key: Long, doc_id: Long)

  case class DocBandTs(band: Int, key: Long, doc_id: Long,
                       ts: java.sql.Timestamp)

  /** Bucket membership + saturation accounting. `ids` is insertion-
    * ordered (latest first); `dropped` counts suppressed arrivals after
    * saturation — nonzero dropped means mass duplication upstream
    * exact-dedup should have absorbed (the bucketStats contract). */
  case class BucketState(ids: List[Long], dropped: Long)

  /** Retention-mode state: membership + the latest member event time,
    * from which the eviction deadline (`lastMs + retention`) derives. */
  case class TimedBucketState(ids: List[Long], dropped: Long, lastMs: Long)

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

  /** Streaming candidate pairs over TEXT with BOUNDED state (r8): same
    * signature math and bucket admission as [[candidates]], plus an
    * event-time eviction deadline per bucket — the T7 timer device.
    * `docs` must be a streaming frame with (idCol: long,
    * textCol: string, tsCol: timestamp); the operator applies the
    * watermark (`watermarkDelay` of event-time slack for late rows).
    * A bucket whose members have all gone quiet for `retention` of
    * EVENT time is dropped from the state store once the watermark
    * passes its deadline; see the object scaladoc for the recall
    * semantics. */
  def candidatesWithRetention(docs: DataFrame, idCol: String,
                              textCol: String, tsCol: String,
                              retention: java.time.Duration,
                              k: Int = 3, numHashes: Int = 12,
                              bands: Int = 4, rows: Int = 3,
                              maxBucketSize: Int = MinHashLSH.DefaultMaxBucket,
                              watermarkDelay: String = "0 seconds")
      : Dataset[CandidatePair] = {
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("ts"),
        posexplode(MinHashLSH.bandedSignatureArr(
          col(textCol), k, numHashes, bands, rows)).as(Seq("band", "key")))
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .as[(Long, java.sql.Timestamp, Int, Long)]
      .map { case (id, ts, band, key) => DocBandTs(band, key, id, ts) }
      // the typed map mints fresh attributes, so the event-time tag must
      // be (re)applied HERE, on the object-serialized ts field, for the
      // EventTimeTimeout below to see a watermark
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateWithRetention(maxBucketSize, retention.toMillis))
  }

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

  /** Shared admission core: dedup arrivals against membership (Set
    * lookup, not a list scan — O(1) per arrival), admit up to the cap
    * emitting a pair per existing member, count the rest as dropped.
    * Arrivals are sorted so emission (and the admitted set under
    * saturation) never depends on partition-internal row order. */
  private def admit(band: Int, prevIds: List[Long], prevDropped: Long,
                    rawArrivals: Array[Long], maxBucketSize: Int)
      : (List[Long], Long, Vector[CandidatePair]) = {
    val seen = prevIds.toSet
    val arrivals = rawArrivals.distinct.sorted.filterNot(seen)
    var ids = prevIds
    var size = ids.length
    var dropped = prevDropped
    val out = Vector.newBuilder[CandidatePair]
    arrivals.foreach { id =>
      if (size < maxBucketSize) {
        ids.foreach { o =>
          out += CandidatePair(math.min(o, id), math.max(o, id), band)
        }
        ids = id :: ids
        size += 1
      } else dropped += 1
    }
    (ids, dropped, out.result())
  }

  private def update(maxBucketSize: Int)(
      bucket: (Int, Long), rows: Iterator[DocBand],
      state: GroupState[BucketState]): Iterator[CandidatePair] = {
    val prev = state.getOption.getOrElse(BucketState(Nil, 0L))
    val (ids, dropped, out) = admit(bucket._1, prev.ids, prev.dropped,
      rows.map(_.doc_id).toArray, maxBucketSize)
    state.update(BucketState(ids, dropped))
    out.iterator
  }

  private def updateWithRetention(maxBucketSize: Int, retentionMs: Long)(
      bucket: (Int, Long), rows: Iterator[DocBandTs],
      state: GroupState[TimedBucketState]): Iterator[CandidatePair] = {
    if (state.hasTimedOut) {
      // idle past retention: drop the bucket. The next arrival on this
      // key re-seeds an empty bucket (documented recall loss).
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(TimedBucketState(Nil, 0L, 0L))
      val rs = rows.toArray
      val (ids, dropped, out) = admit(bucket._1, prev.ids, prev.dropped,
        rs.map(_.doc_id), maxBucketSize)
      val lastMs = math.max(prev.lastMs, rs.iterator.map(_.ts.getTime).max)
      state.update(TimedBucketState(ids, dropped, lastMs))
      // deadline = last member activity + retention, in EVENT time; a
      // late batch can land with the watermark already past that sum,
      // and Spark rejects deadlines at/behind the watermark — clamp
      // forward one ms (the bucket then expires at the next watermark
      // advance, which is the intent)
      state.setTimeoutTimestamp(
        math.max(lastMs + retentionMs, state.getCurrentWatermarkMs() + 1))
      out.iterator
    }
  }
}
