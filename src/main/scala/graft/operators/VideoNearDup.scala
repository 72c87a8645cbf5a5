package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clip-level video near-dup clustering over a per-sampled-frame
  * perceptual-hash table (SURVEY.md §2 MM3 / q231; T24's frozen batch
  * half). Input `(clip_id, f, dhash, n_s)`: one row per clip and
  * sampled frame index, `n_s` = the clip's sampled-frame count.
  *
  * Semantics — TEMPORAL agreement: clips pair iff they have the same
  * sampled count AND every corresponding frame pair is within hamming
  * `k` (a re-encoded/damaged copy collapses; a clip merely sharing one
  * frame — an intro card — does not). Pairing runs one
  * [[HammingJoin]] per frame INDEX (frames never co-shuffle; each
  * index's hash table is clip-count-sized), the agreement aggregate
  * counts banded pairs per clip pair, and [[ConnectedComponents
  * .labelStar]] closes the clip graph.
  *
  * The frame-index list is collected (bounded by the max sampled clip
  * length — a constant of the media schema, never corpus-sized; the
  * BpeVocab-argmax class of sanctioned collect). */
object VideoNearDup {

  /** All agreeing clip pairs `(a_id, b_id)`. */
  def clipPairs(frameHashes: DataFrame, k: Int, bits: Int): DataFrame = {
    // cast pins the contract for any integral `f` (a LongType frame
    // index from sequence/ids must not ClassCastException — r12 ADVICE)
    val fvals = frameHashes.select(col("f").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted // frame-index list: length-bounded
    require(fvals.nonEmpty, "VideoNearDup: no frames")
    val perF = fvals.map { fv =>
      HammingJoin.join(frameHashes.filter(col("f") === fv),
          "clip_id", "dhash", k, bits)
        .select(col("a_id"), col("b_id"))
    }.reduce(_ unionByName _)
    val ns = frameHashes.select(col("clip_id"), col("n_s")).distinct()
    perF.groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("nf_agree"))
      .join(ns.select(col("clip_id").as("a_id"), col("n_s").as("na")), "a_id")
      .join(ns.select(col("clip_id").as("b_id"), col("n_s").as("nb")), "b_id")
      .filter(col("na") === col("nb") && col("nf_agree") === col("na"))
      .select(col("a_id"), col("b_id"))
  }

  /** `(clip_id, component)` — [[clipPairs]] closed by labelStar. */
  def clusterClips(frameHashes: DataFrame, k: Int, bits: Int): DataFrame = {
    val ns = frameHashes.select(col("clip_id")).distinct()
    ConnectedComponents.labelStar(ns, "clip_id",
      clipPairs(frameHashes, k, bits), "a_id", "b_id")
  }
}
