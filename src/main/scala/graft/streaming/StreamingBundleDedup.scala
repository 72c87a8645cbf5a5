package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Streaming multimodal BUNDLE dedup (SURVEY.md §2.9 T28): the q244
  * composition's frozen-model streaming twin. A bundle is a near-dup
  * only when text AND image AND audio all agree (q244's thesis); an
  * arriving bundle must adopt its (text, image, audio) label-triple
  * cluster — or mint — WITHOUT re-clustering the corpus.
  *
  * Freeze = exactly the three clusterings the q244 batch run builds
  * anyway: two [[StreamingHammingDedup.freeze]] banded signature
  * indexes (image dHash, audio energy-sign — each one probe index
  * over DISTINCT masked signatures) plus the text exact-group map
  * (thash → min member id) and the frozen TRIPLE table
  * ((t_c, i_c, a_c) → cluster = min member id).
  *
  * Per micro-batch: each modality resolves independently —
  * text adopts its exact group (novel thashes collapse WITHIN the
  * batch to their min delta id; exact-group semantics are
  * batch-replayable), image and audio adopt-or-mint through their
  * hamming probes — then ONE equi-join on the label triple adopts
  * the frozen bundle cluster; novel triples mint their min delta id
  * per triple within the batch. O(|delta|) throughout; no corpus
  * rescan, no state growth.
  *
  * Caveat class (T22/T24/T25's, documented not hidden): PERCEPTUAL
  * delta-delta pairs don't merge (two streamed bundles near each
  * other but far from the corpus each mint through their hamming
  * probe), and a delta signature within k of two frozen clusters
  * adopts the smaller without merging them — the next batch
  * re-freeze reconciles. The modality-AND law is exact: one broken
  * modality (q244's inverted-image variant) changes the triple and
  * blocks adoption of the original cluster, in stream as in batch.
  */
object StreamingBundleDedup {

  final case class BState(text: DataFrame,
                          img: StreamingHammingDedup.HState,
                          aud: StreamingHammingDedup.HState,
                          triples: DataFrame)

  /** Cluster the frozen bundle corpus per modality (q244's batch
    * machinery via [[StreamingHammingDedup.freeze]]) and freeze the
    * triple table. `bundles`: (bundle_id, thash, ihash, asig). */
  def freeze(bundles: DataFrame, k: Int, bits: Int): BState = {
    val b = bundles
      .select(col("bundle_id"), col("thash"), col("ihash"), col("asig"))
      .barrier() // one corpus pass feeds three clusterings
    val img = StreamingHammingDedup.freeze(
      b.select(col("bundle_id").as("id"), col("ihash").as("sig")), k, bits)
    val aud = StreamingHammingDedup.freeze(
      b.select(col("bundle_id").as("id"), col("asig").as("sig")), k, bits)
    val text = b.groupBy(col("thash"))
      .agg(min(col("bundle_id")).as("t_c")).barrier()
    val labeled = b.join(text, "thash")
      .join(img.clusters.select(col("id").as("bundle_id"),
        col("cluster").as("i_c")), "bundle_id")
      .join(aud.clusters.select(col("id").as("bundle_id"),
        col("cluster").as("a_c")), "bundle_id")
    val triples = labeled.groupBy(col("t_c"), col("i_c"), col("a_c"))
      .agg(min(col("bundle_id")).as("cluster")).barrier()
    BState(text, img, aud, triples)
  }

  /** Assign one micro-batch of `(bundle_id, thash, ihash, asig)`
    * bundles: `(bundle_id, cluster, matched)` — `matched` = 1 iff the
    * full label triple existed in the frozen store. */
  def assignBatch(state: BState, delta: DataFrame): DataFrame = {
    val d = delta
      .select(col("bundle_id"), col("thash"), col("ihash"), col("asig"))
    val tm = d.groupBy(col("thash"))
      .agg(min(col("bundle_id")).as("__tmint"))
      .join(state.text, Seq("thash"), "left_outer")
      .select(col("thash"), coalesce(col("t_c"), col("__tmint")).as("t_c"))
    val iLab = StreamingHammingDedup.assignBatch(state.img,
        d.select(col("bundle_id").as("id"), col("ihash").as("sig")))
      .select(col("id").as("bundle_id"), col("cluster").as("i_c"))
    val aLab = StreamingHammingDedup.assignBatch(state.aud,
        d.select(col("bundle_id").as("id"), col("asig").as("sig")))
      .select(col("id").as("bundle_id"), col("cluster").as("a_c"))
    val lab = d.join(tm, "thash")
      .join(iLab, "bundle_id").join(aLab, "bundle_id")
      .select(col("bundle_id"), col("t_c"), col("i_c"), col("a_c"))
    val joined = lab
      .join(state.triples, Seq("t_c", "i_c", "a_c"), "left_outer")
    val mint = joined.filter(col("cluster").isNull)
      .groupBy(col("t_c"), col("i_c"), col("a_c"))
      .agg(min(col("bundle_id")).as("__mint"))
    joined.join(mint, Seq("t_c", "i_c", "a_c"), "left_outer")
      .select(col("bundle_id"),
        coalesce(col("cluster"), col("__mint")).as("cluster"),
        col("cluster").isNotNull.cast("int").as("matched"))
  }
}
