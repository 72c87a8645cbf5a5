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
  * One JOB per round: each node's previous label rides through the
  * aggregate (it is the single non-null `prev` among the grouped rows),
  * and the changed-node count is an `observe()` metric collected by the
  * SAME action that materializes the round — not a second join+count
  * job over the labels. At cluster scale that halves the per-round
  * stage count and removes a full shuffle per round.
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
      // neighbor's current label, pulled across each edge; `prev` is
      // null here and non-null exactly once per node (its own row), so
      // max(prev) reconstructs the previous label group-side for free
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("component"),
          lit(null).cast("long").as("prev"))
      val candidate = labels
        .select(col("node"), col("component"), col("component").as("prev"))
        .unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"), max(col("prev")).as("prev"))
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$round")
      val observed = candidate
        .observe(obs, sum(when(col("component") =!= col("prev"), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("node"), col("component"))
      // materializing action (eager checkpoint / persist+count) also
      // fills the observation — one job per round, no convergence join
      val next =
        if ((round + 1) % checkpointInterval == 0) observed.localCheckpoint()
        else { val p = observed.persist(); p.count(); p }
      // sum over ZERO rows is null (degenerate empty node set)
      val changed = Option(obs.get("changed")).fold(0L)(_.asInstanceOf[Long])
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
