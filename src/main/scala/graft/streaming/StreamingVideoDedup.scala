package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.{HammingJoin, VideoNearDup}

/** Streaming video near-dup assignment (SURVEY.md §2.9 T24): clips
  * arriving on a stream probe a FROZEN banded frame-hash index of the
  * already-clustered corpus and either ADOPT the matched cluster id or
  * MINT their own — q231's streaming twin, completing the frozen-model
  * family (T14 text LSH, T20 DBSCAN, T22 entity resolution; batch
  * clusters, the stream assigns).
  *
  * Probe shape: the frozen corpus explodes
  * [[HammingJoin.bandValuesExpr]] ONCE into a banded inverted index
  * keyed `(frame index, band, band value)`; each arriving clip's
  * sampled-frame hashes compute their own band arrays statelessly and
  * equi-join it. Candidates verify with the exact popcount at their
  * frame index, and q231's TEMPORAL agreement decides: a frozen match
  * needs the same sampled count and EVERY frame pair within k.
  * Adoption takes the smallest matched cluster id (deterministic);
  * unmatched clips mint their own id.
  *
  * Same frozen-index caveats as T22, documented not hidden: two
  * streamed near-dup clips far from the corpus each mint (no
  * delta-delta pairs), and a clip bridging two frozen clusters adopts
  * the smaller without merging them — the next batch re-freeze
  * reconciles (lambda posture). State is bounded by the frozen corpus:
  * index + cluster map, barriered once at freeze.
  *
  * Scale: freeze = the q231 batch job that exists anyway + one banded
  * explode of the frame-hash table ((k+1)·rows); per batch the delta
  * explodes its own (k+1) bands per frame, equi-joins the index
  * (band-limited fan-out), verifies candidates only, and aggregates —
  * O(|delta|), no corpus rescan, no state growth.
  */
object StreamingVideoDedup {

  final case class VState(index: DataFrame, clusters: DataFrame,
                         k: Int, bits: Int)

  /** Cluster the batch corpus (q231's pipeline via
    * [[VideoNearDup.clusterClips]]) and freeze the banded probe index.
    * `frameHashes`: (clip_id, f, dhash, n_s). Stored hashes are MASKED
    * to the low `bits` bits, mirroring `HammingJoin.collapsed` — bits
    * above the declared width cannot influence banding OR the verify
    * popcount, so streamed assignment agrees with batch clustering on
    * out-of-width inputs too (r12 ADVICE). */
  def freeze(frameHashes: DataFrame, k: Int, bits: Int): VState = {
    val mask = (1L << bits) - 1
    val clusters = VideoNearDup.clusterClips(frameHashes, k, bits)
      .select(col("clip_id"), col("component").as("cluster")).barrier()
    val index = frameHashes
      .withColumn("__bands", HammingJoin.bandValuesExpr("dhash", k, bits))
      .select(col("f"), col("clip_id").as("i_clip"),
        expr(s"CAST(dhash AS BIGINT) & ${mask}L").as("i_hash"),
        col("n_s").as("i_ns"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .barrier()
    VState(index, clusters, k, bits)
  }

  /** Assign one micro-batch of frame-hash rows: `(clip_id, cluster,
    * matched)` per distinct delta clip. */
  def assignBatch(state: VState, delta: DataFrame): DataFrame = {
    val mask = (1L << state.bits) - 1
    val cand = delta
      .withColumn("__bands",
        HammingJoin.bandValuesExpr("dhash", state.k, state.bits))
      // probe hash masked like the frozen i_hash: the popcount verify
      // below sees in-width bits only on BOTH sides
      .select(col("clip_id").as("d_clip"), col("f"),
        expr(s"CAST(dhash AS BIGINT) & ${mask}L").as("dhash"),
        col("n_s").as("d_ns"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .join(state.index, Seq("f", "band", "bval"))
      .filter(expr(s"bit_count(dhash ^ i_hash) <= ${state.k}"))
      .select(col("d_clip"), col("i_clip"), col("f"),
        col("d_ns"), col("i_ns"))
      .distinct()
    val agree = cand.groupBy(col("d_clip"), col("i_clip"))
      .agg(count(lit(1)).as("__c"),
        max(col("d_ns")).as("d_ns"), max(col("i_ns")).as("i_ns"))
      .filter(col("d_ns") === col("i_ns") && col("__c") === col("d_ns"))
    val adopt = agree
      .join(state.clusters.select(col("clip_id").as("i_clip"),
        col("cluster")), "i_clip")
      .groupBy(col("d_clip"))
      .agg(min(col("cluster")).as("__adopt"))
    delta.select(col("clip_id")).distinct()
      .join(adopt, col("clip_id") === col("d_clip"), "left_outer")
      .select(col("clip_id"),
        coalesce(col("__adopt"), col("clip_id")).as("cluster"),
        col("__adopt").isNotNull.cast("int").as("matched"))
  }
}
