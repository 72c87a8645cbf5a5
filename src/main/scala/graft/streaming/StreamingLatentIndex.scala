package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Streaming cross-modal latent index (SURVEY.md §2.9 T33): the
  * q261/q262 shared-latent retrieval's streaming member — arriving
  * documents DECODE their real GRF1 image payloads mid-stream, the
  * recovered 16-dim integer latents append to the index together with
  * their two staggered grid keys (stateless per item — e[0] div 32 and
  * (e[0]+16) div 32 — so the banded ANN structure is append-only by
  * construction, no re-clustering, no frozen-model caveat: both
  * encoders are deterministic arithmetic), and text queries serve off
  * whatever index is live at that instant.
  *
  * Exactly-once under at-least-once delivery: the T26 anti-join
  * discipline — a replayed doc contributes an empty delta and neither
  * duplicates an index row (which would be harmless for top-1 but
  * violates maintained ≡ rebuilt) nor re-decodes its payload.
  *
  * Laws (StreamingSpec T33): after EVERY batch, the banded cross-modal
  * probe off the maintained index equals the same probe off an index
  * REBUILT from scratch over every delivered doc (maintained ≡
  * rebuilt, row for row — grid keys included); replays are no-ops;
  * the index row count equals the delivered distinct-doc count.
  *
  * Scale: per batch O(|delta|) decode+encode (embarrassingly parallel
  * mapPartitions, payload bytes never shuffle); the index accretes by
  * union with the same compaction-cadence re-barrier as the other
  * T-members (bounded plan); serving is the q261 banded probe —
  * broadcast queries, candidates = two grid cells per query. */
object StreamingLatentIndex {

  val CompactEvery = 4

  final case class LiState(items: DataFrame, seenIds: DataFrame,
                           batches: Int = 0)

  /** The q261 image-side encoder: decode the doc's REAL GRF1 payload,
    * recover the 16-dim latent from the reconstructed plane alone
    * (per-dim mean of the plane's 4 repeats). */
  def encodeImages(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import graft.multimodal.IntraVideoCodec
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val seed = md.digest(text.getBytes("UTF-8"))
          val f0 = Array.tabulate(64)(i => seed(i % 16) & 0xff)
          val payload =
            IntraVideoCodec.framePayloads(Seq(f0), 8, 8, 4).head
          val r = IntraVideoCodec.decodePayload(payload, None, 8, 8, 4)
            .getOrElse(sys.error(s"T33: undecodable image, doc $id"))
          val e = Array.tabulate(16)(k =>
            (r(k) + r(k + 16) + r(k + 32) + r(k + 48)).toLong / 4)
          (id, e.toSeq)
        }
      }.toDF("img_id", "e")
      .select(col("img_id"), col("e"),
        expr("e[0] div 32").as("b1"),
        expr("(e[0] + 16) div 32").as("b2"))
  }

  /** The q261 text-side hash-projection query encoder + grid keys. */
  def encodeQueries(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("q_id"),
        expr("""transform(sequence(1, 16), k ->
          cast(conv(substring(md5(text), 2 * k - 1, 2), 16, 10)
            as bigint))""").as("qe"))
      .select(col("q_id"), col("qe"),
        expr("qe[0] div 32").as("b1"),
        expr("(qe[0] + 16) div 32").as("b2"))

  def freeze(spark: org.apache.spark.sql.SparkSession): LiState = {
    import org.apache.spark.sql.types._
    val itemsSchema = StructType(Seq(
      StructField("img_id", LongType),
      StructField("e", ArrayType(LongType)),
      StructField("b1", LongType),
      StructField("b2", LongType)))
    val empty = (s: StructType) => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    LiState(empty(itemsSchema),
      empty(StructType(Seq(StructField("doc_id", LongType)))))
  }

  /** Apply one micro-batch of `(doc_id, text)` documents. */
  def applyBatch(state: LiState, delta: DataFrame): LiState = {
    val fresh = delta
      .select(col(delta.columns.head).cast("long").as("doc_id"),
        col(delta.columns(1)).as("text"))
      .dropDuplicates("doc_id")
      .join(state.seenIds, Seq("doc_id"), "left_anti")
      .barrier()
    val nBatches = state.batches + 1
    val items0 = state.items.unionByName(encodeImages(fresh))
    val seen0 = state.seenIds.unionByName(fresh.select(col("doc_id")))
    val (items, seen) =
      if (nBatches % CompactEvery == 0)
        (items0.barrier(), seen0.distinct().barrier())
      else (items0, seen0)
    LiState(items, seen, nBatches)
  }

  /** Apply a TAKEDOWN batch of doc ids mid-stream (T35, r15): the
    * delete member of the cross-modal family — a right-to-be-
    * forgotten event must remove the doc's latent from the retrieval
    * index (the media payload's derived representation is still the
    * doc's data). Items anti-join the dead ids; the dead ids enter
    * the seen set as tombstones-forever, so a doc taken down before
    * its media ever arrives never indexes and replays of reaped docs
    * stay structural no-ops. Grid keys are stateless per item, so no
    * structure rebuilds — the delete is one anti-join. */
  def applyTakedown(state: LiState, dead: DataFrame): LiState = {
    val ids = dead
      .select(col(dead.columns.head).cast("long").as("doc_id"))
      .distinct()
      .barrier()
    val items = state.items
      .join(ids.select(col("doc_id").as("img_id")), Seq("img_id"),
        "left_anti")
      .barrier()
    val seen = state.seenIds.unionByName(ids).distinct().barrier()
    LiState(items, seen, state.batches)
  }

  /** The q261 banded cross-modal probe off the LIVE index: candidates
    * = the query's two grid cells, exact L1 verify, min-struct top-1.
    * Returns (q_id, nn_id, nn_d); queries with no candidate in either
    * cell are absent (cannot happen for an arrived own-image — the
    * staggered grids guarantee any two values within 16 share a
    * cell). */
  def serve(state: LiState, queries: DataFrame): DataFrame = {
    val l1 = expr("""aggregate(zip_with(qe, e, (a, b) -> abs(a - b)),
      0L, (acc, x) -> acc + x)""")
    val cand = state.items
      .join(broadcast(queries.select(col("q_id"), col("qe"), col("b1"))),
        Seq("b1"))
      .select(col("q_id"), col("qe"), col("img_id"), col("e"))
      .unionByName(state.items
        .join(broadcast(queries.select(col("q_id"), col("qe"), col("b2"))),
          Seq("b2"))
        .select(col("q_id"), col("qe"), col("img_id"), col("e")))
      .dropDuplicates("q_id", "img_id")
    cand.withColumn("d", l1)
      .groupBy(col("q_id"))
      .agg(min(struct(col("d"), col("img_id"))).as("m"))
      .select(col("q_id"), col("m.img_id").as("nn_id"),
        col("m.d").as("nn_d"))
  }
}
