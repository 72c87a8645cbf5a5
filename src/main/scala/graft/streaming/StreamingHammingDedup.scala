package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.{ConnectedComponents, HammingJoin}

/** Streaming single-signature hamming near-dup assignment (SURVEY.md
  * §2.9 T25): records carrying ONE fixed-width perceptual signature —
  * audio energy-sign fingerprints (q232), image dHashes (q217),
  * SimHash fingerprints — probe a FROZEN banded signature index of the
  * already-clustered corpus and either ADOPT the matched cluster or
  * MINT their own. Completes the frozen-model family for the
  * single-signature modalities; `StreamingVideoDedup` remains the
  * per-frame temporal-agreement variant.
  *
  * Probe shape: freeze = the batch collapse that exists anyway
  * ([[HammingJoin.collapsed]] representatives + rep-level labelStar —
  * q217/q232's exact pipeline) plus ONE banded explode of the DISTINCT
  * masked signatures via [[HammingJoin.bandValuesExpr]] keyed
  * `(band, band value)`, each distinct signature carrying its cluster.
  * Arriving rows band their own signature statelessly, equi-join the
  * index, verify with the exact popcount, and adopt the smallest
  * matched cluster id (deterministic); unmatched rows mint their own
  * id. Signatures are MASKED to the low `bits` bits on BOTH sides
  * (banding and verify — the r12 T24 lesson, enforced from day one).
  *
  * Same frozen-index caveats as T22/T24, documented not hidden: two
  * streamed near-dups far from the corpus each mint (no delta-delta
  * pairs), and a delta signature within k of TWO frozen clusters
  * adopts the smaller without merging them — the next batch re-freeze
  * reconciles (lambda posture). State is bounded by DISTINCT frozen
  * signatures (viral duplicate groups are one index row), barriered
  * once at freeze.
  *
  * Scale: freeze adds (k+1) rows per distinct signature to the batch
  * job; per micro-batch the delta explodes its own k+1 bands per row,
  * equi-joins the index (band-limited fan-out), verifies candidates
  * only — O(|delta|), no corpus rescan, no state growth.
  */
object StreamingHammingDedup {

  final case class HState(index: DataFrame, clusters: DataFrame,
                          k: Int, bits: Int)

  /** Cluster the batch corpus (q217/q232's collapse) and freeze the
    * banded probe index. `sigs`: (id, sig). */
  def freeze(sigs: DataFrame, k: Int, bits: Int): HState = {
    val mask = (1L << bits) - 1
    val (repPairs, members) = HammingJoin.collapsed(sigs, "id", "sig", k, bits)
    val repLabeled = ConnectedComponents.labelStar(
      members.select(col("rep")).distinct(), "rep", repPairs, "rep_a", "rep_b")
    val clusters = members.join(repLabeled, "rep")
      .select(col("id"), col("component").as("cluster")).barrier()
    // one index row set per DISTINCT masked signature; every member of
    // a signature shares one cluster, so min() is just determinism
    val sigClusters = sigs
      .select(col("id"), expr(s"CAST(sig AS BIGINT) & ${mask}L").as("i_sig"))
      .join(clusters, "id")
      .groupBy(col("i_sig")).agg(min(col("cluster")).as("i_cluster"))
    val index = sigClusters
      .withColumn("__bands", HammingJoin.bandValuesExpr("i_sig", k, bits))
      .select(col("i_sig"), col("i_cluster"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .barrier()
    HState(index, clusters, k, bits)
  }

  /** Assign one micro-batch of `(id, sig)` rows: `(id, cluster,
    * matched)` per distinct delta id. An id arriving with MULTIPLE
    * signatures in one micro-batch is collapsed to its min masked
    * signature BEFORE probing — one deterministic (id, sig) truth per
    * batch, so the streamed==batch law cannot silently depend on
    * input uniqueness (the row-independent batch comparison has no
    * single answer for a two-signature id otherwise). */
  def assignBatch(state: HState, delta: DataFrame): DataFrame = {
    val mask = (1L << state.bits) - 1
    val adopt = delta
      .select(col("id").as("d_id"),
        expr(s"CAST(sig AS BIGINT) & ${mask}L").as("d_sig"))
      .groupBy(col("d_id")).agg(min(col("d_sig")).as("d_sig"))
      .withColumn("__bands",
        HammingJoin.bandValuesExpr("d_sig", state.k, state.bits))
      .select(col("d_id"), col("d_sig"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .join(state.index, Seq("band", "bval"))
      .filter(expr(s"bit_count(d_sig ^ i_sig) <= ${state.k}"))
      .groupBy(col("d_id"))
      .agg(min(col("i_cluster")).as("__adopt"))
    delta.select(col("id")).distinct()
      .join(adopt, col("id") === col("d_id"), "left_outer")
      .select(col("id"),
        coalesce(col("__adopt"), col("id")).as("cluster"),
        col("__adopt").isNotNull.cast("int").as("matched"))
  }
}
