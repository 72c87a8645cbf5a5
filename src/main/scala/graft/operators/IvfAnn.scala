package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor with a probe-count
  * knob (SURVEY.md §2.10 N13; the scale path behind q69's fixed
  * 1-probe oracle contract). Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 §IV-A is the coarse-quantizer
  * shape; no product quantization here — residuals stay exact.
  *
  * The corpus is partitioned once into k centroid cells (exact L2,
  * ties to the smaller centroid id — deterministic, reprocess-stable);
  * each query then searches only its `nProbe` nearest cells.
  * Scale shape: assignment is a broadcast of the k-row centroid table
  * against the corpus (never a corpus shuffle); the probe join sends
  * each query to nProbe cells, so per-query work is ~nProbe/k of a
  * full scan, and the candidate stream shuffles only (q_id, vec_id,
  * cos) triples.
  *
  * Probe-count / recall trade-off (recall@10 vs brute-force ground
  * truth; IvfAnnSpec pins all of this):
  *
  *   - STRUCTURELESS corpus (the near-random embeddings fixture,
  *     500×64f, k=8, 3 disjoint 10-query sets — the worst case:
  *     neighbors scatter uniformly over cells, so recall ≈ nProbe/k):
  *       nProbe     1     2     4     6     8 (=k)
  *       measured   0.17–0.28  0.32–0.44  0.58–0.72  0.82–0.91  1.00
  *       spec floor ≥ 0.8·nProbe/k per probe set,  = 1.00 at k exactly
  *   - CLUSTERED corpus (8 tight synthetic clusters — the data IVF is
  *     FOR): recall@10 ≥ 0.95 at nProbe = 1.
  *
  * nProbe = k IS brute force — cell pruning skips vectors, never
  * rescores them — so recall rises monotonically to exactly 1.0.
  * Operationally: probe more cells when the cell-occupancy histogram
  * says the corpus is flat; a corpus with real cluster structure earns
  * the ~k× scan cut at nProbe 1–2.
  */
object IvfAnn {

  /** Nearest-centroid cell per corpus vector: (idCol, vecCol, c_id).
    * The argmin is a map-side-combinable `min(struct(d2, c_id, vec))`
    * — lexicographic struct ordering gives exact-L2 ranking with ties
    * to the smaller centroid id, and the k candidate rows per vector
    * collapse to one BEFORE any exchange (a row_number window here
    * would instead shuffle the k-times-expanded candidate set, vector
    * payloads included). Shuffle: at most one combined row per vector.
    * @param cents (c_id, c_vec) — k rows, broadcast. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             cents: DataFrame): DataFrame = {
    val d2 = (VectorOps.normSq(col(vecCol)) -
      lit(2.0) * VectorOps.dot(col(vecCol), col("c_vec"))) +
      VectorOps.normSq(col("c_vec"))
    corpus.crossJoin(broadcast(cents))
      .withColumn("__d2", d2)
      .groupBy(col(idCol))
      .agg(min(struct(col("__d2").as("d"), col("c_id").as("c"),
        col(vecCol).as("v"))).as("__m"))
      .select(col(idCol), col("__m.v").as(vecCol), col("__m.c").as("c_id"))
  }

  /** Top-k cosine neighbors per query over the nProbe nearest cells.
    * @param assigned output of [[assign]]
    * @param queries (q_id, q_vec); self-matches (q_id == corpus id) are
    *   excluded. Returns (q_id, rn, idCol, cos), rn = 1..k. */
  def topK(assigned: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, cents: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val qd2 = (VectorOps.normSq(col("q_vec")) -
      lit(2.0) * VectorOps.dot(col("q_vec"), col("c_vec"))) +
      VectorOps.normSq(col("c_vec"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("__d2").asc, col("c_id").asc)
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("__d2", qd2)
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("c_id"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol).asc)
    assigned.join(broadcast(probed),
        Seq("c_id")).filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", VectorOps.cosine(col("q_vec"), col(vecCol)))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col(idCol), col("cos"))
  }
}
