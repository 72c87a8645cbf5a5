package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.{IndexReshard, PostingCodec, ReplicatedIndex, ShardedIndex}

/** Streaming REPLICATED index (SURVEY.md §2.9 T39, r16): q294's
  * two-copy topology maintained under a stream — every production
  * ingest writes primaries AND replicas per commit (Elasticsearch
  * indexes into both shard copies; Dynamo writes its preference list),
  * so a node can die at ANY instant and serving routes around it with
  * no answer changed. Per micro-batch:
  *
  *   - the T26 exactly-once discipline (dedup + anti-join against the
  *     accumulated seen-id set);
  *   - fresh docs place via [[ReplicatedIndex.assignPR]] (the Dynamo
  *     preference list on the md5 ring) and mint TWO delta segments —
  *     a primary q258 segment keyed (shard, term, bucket) and a
  *     replica segment keyed (node, origin, term, bucket) — T31's
  *     shape, both copies;
  *   - every [[CompactEvery]] batches both segment lists fold to one
  *     (q264's byte-exact merge on each store's key).
  *
  * Serving at any instant routes like q294: primary-only, or failover
  * of ANY node x (primaries of nodes ≠ x ∪ replica blocks with
  * origin = x, a corpus partition across the live segment lists —
  * segments hold disjoint docs by the T26 discipline, so metadata df
  * stays exact across segments AND copies). StreamingSpec T39 pins
  * failover-serve ≡ the from-scratch exhaustive ranking for EVERY
  * failed node after EVERY wave, replay no-ops, and the final
  * compacted stores ≡ [[ReplicatedIndex.build]] over every delivered
  * doc, BOTH copies BYTE FOR BYTE.
  *
  * Scale: per batch O(|delta|) twice (the 2× write amplification
  * replication always costs); compaction on the cadence bounds the
  * segment count and the plan; serving reads query-term blocks ×
  * live segments of the routed selection only. */
object StreamingReplicatedIndex {

  val CompactEvery = 4

  final case class RiState(primSegs: List[DataFrame],
      replSegs: List[DataFrame], seenIds: DataFrame, dl: DataFrame,
      tombstones: DataFrame, nShards: Int, batches: Int = 0)

  def freeze(spark: org.apache.spark.sql.SparkSession,
      nShards: Int): RiState = {
    import org.apache.spark.sql.types.{StructType, StructField, LongType}
    def empty(fields: String*) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map(StructField(_, LongType))))
    RiState(Nil, Nil, empty("doc_id"), empty("doc_id", "dl"),
      empty("doc_id"), nShards)
  }

  /** q264's merge with the replica store's (node, origin) compound key. */
  private[graft] def mergeReplica(segs: Seq[DataFrame]): DataFrame = {
    val s = segs.head.sparkSession
    import s.implicits._
    segs.reduce(_ unionByName _)
      .select($"node", $"origin", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, Long, String, Long, Int, Array[Byte])]
      .groupByKey(r => (r._1, r._2, r._3, r._4))
      .mapGroups { (key: (Long, Long, String, Long),
                    rows: Iterator[(Long, Long, String, Long, Int, Array[Byte])]) =>
        val (node, origin, term, bucket) = key
        val all = rows.flatMap { case (_, _, _, _, df, bytes) =>
          PostingCodec.decode(bytes, df).getOrElse(sys.error(
            s"replica merge: corrupt block $node/$origin/('$term', $bucket)"))
        }.toVector.sortBy(_._1)
        require(all.map(_._1).distinct.size == all.size,
          s"replica merge: overlapping doc ids in $node/$origin/('$term', $bucket)")
        (node, origin, term, bucket, all.size, PostingCodec.encode(all))
      }
      .toDF("node", "origin", "term", "bucket", "df", "bytes")
  }

  /** Apply one micro-batch of `(doc_id, text)` documents — BOTH copies'
    * delta segments minted per batch. Tombstoned ids (T41 takedowns,
    * arrived OR not-yet-arrived at takedown time) never index. */
  def applyBatch(state: RiState, delta: DataFrame): RiState = {
    val s = delta.sparkSession
    import s.implicits._
    val fresh = delta
      .select(col(delta.columns.head).cast("long").as("doc_id"),
        col(delta.columns(1)).as("text"))
      .dropDuplicates("doc_id")
      .join(state.seenIds, Seq("doc_id"), "left_anti")
      .join(state.tombstones, Seq("doc_id"), "left_anti")
      .barrier()
    val nBatches = state.batches + 1
    val (pSegs, rSegs) =
      if (fresh.isEmpty) (state.primSegs, state.replSegs)
      else {
        val positioned = fresh.withColumn("p",
          IndexReshard.position($"doc_id"))
        val a = ReplicatedIndex.assignPR(positioned, state.nShards)
        val pSeg = ShardedIndex.buildStore(
          a.select($"primary".as("shard"), $"doc_id", $"text")).barrier()
        val rSeg = ReplicatedIndex.buildReplicaStore(
          a.select($"replica".as("node"), $"primary".as("origin"),
            $"doc_id", $"text")).barrier()
        (pSeg :: state.primSegs, rSeg :: state.replSegs)
      }
    val seenUnion = state.seenIds.unionByName(fresh.select($"doc_id"))
    val dlUnion = state.dl.unionByName(fresh.select($"doc_id",
      size(split($"text", " ")).cast("long").as("dl")))
    if (nBatches % CompactEvery == 0)
      state.copy(
        primSegs =
          if (pSegs.lengthCompare(1) > 0)
            List(StreamingElasticIndex.mergeSharded(pSegs).barrier())
          else pSegs,
        replSegs =
          if (rSegs.lengthCompare(1) > 0)
            List(mergeReplica(rSegs).barrier())
          else rSegs,
        seenIds = seenUnion.distinct().barrier(),
        dl = dlUnion.barrier(), batches = nBatches)
    else state.copy(primSegs = pSegs, replSegs = rSegs,
      seenIds = seenUnion, dl = dlUnion, batches = nBatches)
  }

  /** A node joins MID-STREAM (T40, r16): compact both copies, run
    * q302's index-only replicated grow (the old assignment recomputes
    * deterministically from the dl sidecar's ids at the current ring —
    * no assignment state is carried), grow the ring. Later batches
    * place at the grown ring. Serving — including failover of ANY
    * node — is invariant across the topology change (global-stats
    * argument); StreamingSpec T40 pins it plus the final byte law at
    * the grown ring. */
  def grow(state: RiState): RiState = state.primSegs match {
    case Nil =>
      state.copy(nShards = state.nShards + 1)
    case pSegs =>
      val prim =
        if (pSegs.lengthCompare(1) > 0)
          StreamingElasticIndex.mergeSharded(pSegs)
        else pSegs.head
      val repl =
        if (state.replSegs.lengthCompare(1) > 0) mergeReplica(state.replSegs)
        else state.replSegs.head
      val s = prim.sparkSession
      import s.implicits._
      val ids = state.dl.select($"doc_id")
        .withColumn("p", IndexReshard.position($"doc_id"))
      val aOld = ReplicatedIndex.assignPR(ids, state.nShards)
        .select($"doc_id", $"primary", $"replica")
      val grown = ReplicatedIndex.grow(
        ReplicatedIndex.Replicated(aOld, prim, repl, state.dl,
          stats(state.dl), state.nShards),
        state.nShards)
      state.copy(primSegs = List(grown.primaryStore.barrier()),
        replSegs = List(grown.replicaStore.barrier()),
        nShards = state.nShards + 1)
  }

  /** TAKEDOWN mid-stream (T41, r17): q304's two-copy block surgery run
    * across every LIVE segment of both lists, plus a tombstone so ids
    * named BEFORE they arrive never index — the right-to-be-forgotten
    * contract a stream must honor for documents still in flight.
    * Segments hold disjoint docs (the T26 discipline), so the per-
    * segment surgery composes: afterwards the live lists hold exactly
    * the delivered-minus-tombstoned corpus, and the final compacted
    * stores equal [[ReplicatedIndex.build]] over that corpus BYTE FOR
    * BYTE (StreamingSpec T41 pins it, plus failover-serve correctness
    * after the takedown and the never-index law for late arrivals).
    *
    * Tombstones persist FOREVER (they must — a tombstone dropped after
    * the surgery re-admits a replayed or late copy of the dead doc);
    * each takedown event re-barriers the union, so the plan stays
    * bounded by the (rare) takedown count, not the batch count.
    *
    * Scale: q304's posture per live segment — bucket-grouped dead
    * arrays, compact-key equi-joins, |touched blocks| re-encode; the
    * dl shrink is one anti-join on doc_id. */
  def takedown(state: RiState, deadIds: DataFrame): RiState = {
    val s = deadIds.sparkSession
    import s.implicits._
    val dead = deadIds
      .select(col(deadIds.columns.head).cast("long").as("doc_id"))
      .distinct().barrier()
    val deadB = dead
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    state.copy(
      primSegs = state.primSegs.map(surgery(_, "shard", None, deadB)),
      replSegs =
        state.replSegs.map(surgery(_, "node", Some("origin"), deadB)),
      dl = state.dl.join(dead, Seq("doc_id"), "left_anti").barrier(),
      tombstones =
        state.tombstones.unionByName(dead).distinct().barrier())
  }

  /** q304's block surgery on one live segment of either store —
    * shared by [[takedown]] and [[applyUpdate]] (both verbs start by
    * dropping the named ids' old postings). `deadB` is the (bucket →
    * ids) grouping. */
  private def surgery(seg: DataFrame, k1: String, k2: Option[String],
      deadB: DataFrame): DataFrame = {
    val s = seg.sparkSession
    import s.implicits._
    val keyed = seg.select(col(k1).as("k1"),
      k2.map(col).getOrElse(lit(-1L)).as("k2"),
      col("term"), col("bucket"), col("df"), col("bytes"))
    val cut = ReplicatedIndex.dropFromBlocks(keyed, deadB)
    k2 match {
      case Some(c2) => cut.select($"k1".as(k1), $"k2".as(c2), $"term",
        $"bucket", $"df", $"bytes").barrier()
      case None => cut.select($"k1".as(k1), $"term", $"bucket", $"df",
        $"bytes").barrier()
    }
  }

  /** Apply an UPDATE batch of `(doc_id, text)` documents mid-stream
    * (T44, r18): q319's re-index verb under a live stream, against the
    * TWO-COPY state — an updated doc replaces its postings in BOTH
    * copies the moment the event lands, so a failover at ANY instant
    * serves the new version (q319's staleness argument, live). Every
    * live segment of both lists gets the id surgery, then the new text
    * mints BOTH delta segments at each doc's ring placement (placement
    * is a pure function of doc_id — existing docs re-derive their
    * unchanged homes, novel ids place fresh: the upsert half).
    * Tombstoned ids are REJECTED before the surgery (the T41
    * tombstones-forever discipline beats the `index` verb — the
    * StreamingPostings ADVICE fix, same device); updated ids enter the
    * seen set so a LATER stream arrival of an upserted doc cannot
    * double-index. Off-cadence segments compact when the list
    * overflows (T31's bound).
    *
    * Laws (StreamingSpec T44): after any interleaving of inserts,
    * updates and a takedown, primary serve AND every failover serve ≡
    * the batch build over latest-live versions; final compacted stores
    * ≡ [[ReplicatedIndex.build]] over that corpus BYTE FOR BYTE;
    * identical re-sends idempotent; tombstoned updates are no-ops.
    *
    * Scale: per update O(|updated| grouping + touched blocks
    * re-encode) × live segments (cadence-bounded) × 2 copies + one
    * |updated|-sized two-copy delta encode; never corpus-shaped. */
  def applyUpdate(state: RiState, updated: DataFrame): RiState = {
    val s = updated.sparkSession
    import s.implicits._
    val up = updated
      .select(col(updated.columns.head).cast("long").as("doc_id"),
        col(updated.columns(1)).as("text"))
      .dropDuplicates("doc_id")
      .join(state.tombstones, Seq("doc_id"), "left_anti")
      .barrier()
    val ids = up.select($"doc_id")
    val idB = ids
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    val cutP = state.primSegs.map(surgery(_, "shard", None, idB))
    val cutR = state.replSegs.map(surgery(_, "node", Some("origin"), idB))
    val positioned = up.withColumn("p", IndexReshard.position($"doc_id"))
    val a = ReplicatedIndex.assignPR(positioned, state.nShards)
    val pGrown = ShardedIndex.buildStore(
      a.select($"primary".as("shard"), $"doc_id", $"text")).barrier() ::
      cutP
    val rGrown = ReplicatedIndex.buildReplicaStore(
      a.select($"replica".as("node"), $"primary".as("origin"),
        $"doc_id", $"text")).barrier() :: cutR
    state.copy(
      primSegs =
        if (pGrown.lengthCompare(CompactEvery) > 0)
          List(StreamingElasticIndex.mergeSharded(pGrown).barrier())
        else pGrown,
      replSegs =
        if (rGrown.lengthCompare(CompactEvery) > 0)
          List(mergeReplica(rGrown).barrier())
        else rGrown,
      seenIds = state.seenIds.unionByName(ids).distinct().barrier(),
      dl = state.dl.join(ids, Seq("doc_id"), "left_anti")
        .unionByName(up.select($"doc_id",
          size(split($"text", " ")).cast("long").as("dl")))
        .barrier())
  }

  private def stats(dl: DataFrame): DataFrame = {
    val s = dl.sparkSession
    import s.implicits._
    dl.agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
  }

  /** Serve off the PRIMARY copies of the live segment lists. */
  def servePrimary(state: RiState, qTerms: Seq[String], k: Int): DataFrame = {
    require(state.primSegs.nonEmpty, "nothing indexed yet")
    val sel = state.primSegs
      .map(_.select(col("shard").as("node"), col("term"), col("bucket"),
        col("df"), col("bytes")))
      .reduce(_ unionByName _)
    ReplicatedIndex.serveBlocks(sel, state.dl, stats(state.dl), qTerms, k)
  }

  /** Node `failed` is down RIGHT NOW: q294's failover selection taken
    * across the live segment lists. */
  def serveFailover(state: RiState, failed: Long, qTerms: Seq[String],
      k: Int): DataFrame = {
    require(state.primSegs.nonEmpty, "nothing indexed yet")
    val prim = state.primSegs
      .map(_.filter(col("shard") =!= failed)
        .select(col("shard").as("node"), col("term"), col("bucket"),
          col("df"), col("bytes")))
      .reduce(_ unionByName _)
    val repl = state.replSegs
      .map(_.filter(col("origin") === failed)
        .select(col("node"), col("term"), col("bucket"), col("df"),
          col("bytes")))
      .reduceOption(_ unionByName _)
    val sel = repl.map(prim.unionByName(_)).getOrElse(prim)
    ReplicatedIndex.serveBlocks(sel, state.dl, stats(state.dl), qTerms, k)
  }
}
