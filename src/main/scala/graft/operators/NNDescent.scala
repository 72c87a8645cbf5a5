package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** NN-Descent KNN-graph construction (SURVEY.md §2.11a N41) — Dong,
  * Moses & Li, "Efficient K-Nearest Neighbor Graph Construction for
  * Generic Similarity Measures" (WWW 2011): start from ANY k-neighbor
  * guess and repeatedly apply the local-join principle — "a neighbor
  * of a neighbor is likely a neighbor" — until the graph converges.
  * The KNN graph is the backbone of graph-ANN serving (HNSW/NSG build
  * on one), of graph-based dedup/clustering, and of manifold methods;
  * NN-Descent is THE map-reduce-friendly way to build it: each round
  * is a bounded local join, no global index, no sequential insert
  * order (which is why HNSW itself doesn't fit a data-parallel
  * engine, and this does).
  *
  * Round shape (all bounded per node):
  *   1. incident lists: each edge (v,u,d) contributes to BOTH
  *      endpoints; per node keep the 2k closest incident neighbors
  *      (ties to the smaller id) — the cap bounds the local join even
  *      when a hub node acquires many reverse edges (the paper's ρ·k
  *      sampling, made deterministic).
  *   2. local join: all pairs within a node's capped incident list
  *      become candidates for EACH OTHER — ≤ (2k)² candidates per
  *      node, corpus-size-independent.
  *   3. union with the current edges, dedup, score with exact-BIGINT
  *      grid distances, keep top-k per node.
  *
  * Scale: candidates shuffle as (v,u) long pairs plus two id-keyed
  * joins to fetch endpoint vectors (the vectors themselves move only
  * to score candidates that survived dedup — ≤ N·(2k)²); the top-k is
  * partial-aggregated map-side. Shuffle volume per round is O(N·k²)
  * ids — never quadratic in N, never a global sort.
  *
  * Determinism: distances exact on the [[KMeansInt.quantize]] grid,
  * every top-k ties (d ASC, id ASC), so the whole iterative build
  * hash-matches a DuckDB twin with the rounds unrolled as CTEs.
  */
object NNDescent {

  /** One NN-Descent refinement round over (v, u, d) edges. */
  private def round(vq: DataFrame, idCol: String, e: DataFrame,
                    k: Int): DataFrame = {
    val inc = e.select(col("v").as("node"), col("u").as("nb"), col("d"))
      .unionByName(e.select(col("u").as("node"), col("v").as("nb"), col("d")))
      .groupBy(col("node"), col("nb")).agg(min(col("d")).as("d"))
    // cap: 2k closest incident neighbors per node (deterministic ρ·k)
    val incTop = topPerKey(inc, "node", "nb", 2 * k)
    val pairs = incTop.as("a").join(incTop.as("b"), "node")
      .filter(col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("v"), col("b.nb").as("u"))
    val cand = pairs
      .unionByName(pairs.select(col("u").as("v"), col("v").as("u")))
      .unionByName(e.select(col("v"), col("u")))
      .filter(col("v") =!= col("u"))
      .distinct()
    score(vq, idCol, cand, k)
  }

  /** Score candidate (v,u) pairs and keep top-k per v by (d, u). */
  private def score(vq: DataFrame, idCol: String, cand: DataFrame,
                    k: Int): DataFrame = {
    val scored = cand
      .join(vq.select(col(idCol).as("v"), col("xq").as("__xv")), "v")
      .join(vq.select(col(idCol).as("u"), col("xq").as("__xu")), "u")
      .select(col("v"), col("u"),
        KMeansInt.sqDist(col("__xv"), col("__xu")).as("d"))
    topPerKey(scored.withColumnRenamed("v", "node")
        .withColumnRenamed("u", "nb"), "node", "nb", k)
      .select(col("node").as("v"), col("nb").as("u"), col("d"))
  }

  /** Bounded top-k of (key, other, d) rows per key by (d, other) —
    * the TopKScored partial aggregate, so only k rows per (key,
    * mapper) cross the exchange. d ≤ 64·(4·10⁴)² ≈ 10¹¹ ≪ 2⁵³: the
    * Double negation is exact (q193's argument). */
  private def topPerKey(df: DataFrame, key: String, other: String,
                        k: Int): DataFrame = {
    implicit val inEnc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Double, Long, Long)]()
    val topk = udaf(new graft.functions.TopKScored(k))
    df.groupBy(col(key))
      .agg(topk((-col("d")).cast("double"), col(other), col("d")).as("nn"))
      .select(col(key), explode(col("nn")).as("e"))
      .select(col(key), col("e.id").as(other), col("e.tag").as("d"))
  }

  /** Full build: score + prune the initial guess, run `rounds` local
    * joins, return (v, rn, u, d) ranked per node (rn = 1..k by
    * (d ASC, u ASC)). */
  def build(vq: DataFrame, idCol: String, initEdges: DataFrame,
            k: Int, rounds: Int): DataFrame = {
    // LAZY round barriers (r19, GraphAnn's device): under AQE the
    // checkpoint's shuffle stages run at construction anyway; lazy
    // folds each round's result-write job into the next round's
    // construction — same plans, same lineage truncation, one job
    // less per round.
    var e = score(vq, idCol,
      initEdges.filter(col("v") =!= col("u")).distinct(), k)
      .barrier(eager = false)
    for (_ <- 1 to rounds) e = round(vq, idCol, e, k).barrier(eager = false)
    // final ranked emission (e is already per-node top-k; re-ranking
    // is a cheap bounded aggregate that restores the rank order)
    implicit val inEnc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Double, Long, Long)]()
    val topk = udaf(new graft.functions.TopKScored(k))
    e.groupBy(col("v"))
      .agg(topk((-col("d")).cast("double"), col("u"), col("d")).as("nn"))
      .select(col("v"), posexplode(col("nn")).as(Seq("i", "e")))
      .select(col("v"), (col("i") + 1).as("rn"),
        col("e.id").as("u"), col("e.tag").as("d"))
  }
}
