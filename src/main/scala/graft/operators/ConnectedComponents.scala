package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * cluster-collapse step of a dedup pipeline (near-dup PAIRS from
  * MinHash/SimHash become duplicate CLUSTERS; the pipeline keeps one
  * representative per cluster).
  *
  * Algorithm (large-star/small-star simplified): every node starts
  * labeled with its own id; each round, a node adopts the minimum label
  * among itself and its neighbors; stop when no label changes. Rounds
  * needed = graph diameter (near-dup clusters are tiny — a handful of
  * rounds), each round one join + one aggregate on (node) — all
  * shuffles on compact long keys. The driver-side loop only checks the
  * convergence COUNT per round, never the data.
  *
  * Deterministic: min over longs, no ordering sensitivity anywhere.
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns (srcCol, dstCol)
    * @param nodes one row per node id (isolated nodes keep themselves)
    * @param maxRounds hard cap on propagation rounds; exceeding it THROWS
    *   (an unconverged labeling is silently-wrong clusters — at scale
    *   prefer a loud failure and a bigger cap over corrupt dedup output)
    * @param checkpointInterval every this-many rounds the label frame is
    *   `localCheckpoint`ed instead of persisted. persist() keeps the DATA
    *   hot but the logical plan still chains through every prior round,
    *   so the plan grows linearly and a lost partition at round k
    *   recomputes all k rounds; checkpointing materializes the RDD and
    *   truncates lineage — standard iterative-algorithm hygiene on a
    *   real cluster (use checkpoint-with-dir there for executor-loss
    *   tolerance; localCheckpoint is the single-JVM variant).
    * @return (idCol, "component") — component = min node id reachable */
  def label(nodes: DataFrame, idCol: String,
            edges: DataFrame, srcCol: String, dstCol: String,
            maxRounds: Int = 20, checkpointInterval: Int = 5): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct().persist()
    var labels = nodes.select(col(idCol).as("node"), col(idCol).as("component"))
      .persist()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // neighbor's current label, pulled across each edge
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("component"))
      val candidate = labels.unionByName(viaNeighbors)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
      val next =
        if ((round + 1) % checkpointInterval == 0) candidate.localCheckpoint()
        else candidate.persist()
      val changed = next.join(labels.withColumnRenamed("component", "prev"), "node")
        .filter(col("component") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      round += 1
    }
    sym.unpersist()
    require(converged,
      s"connected components did not converge within $maxRounds rounds " +
        "(component diameter exceeds the cap); raise maxRounds — returning " +
        "partial labels would silently merge/split dedup clusters")
    labels.select(col("node").as(idCol), col("component"))
  }
}
