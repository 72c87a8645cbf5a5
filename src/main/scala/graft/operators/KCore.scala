package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed peel is Matula–Beck bucketing restricted to one k) —
  * the graph-quality primitive behind spam-farm removal and
  * "well-connected entity" corpus curation: a node survives iff it has
  * >= k neighbors that themselves survive.
  *
  * Peeling is monotone — the alive set only shrinks, and once a round
  * removes nothing the set is the exact k-core (the maximal subgraph
  * with min degree >= k). That gives the differential-oracle contract:
  * a fixed unrolled-R SQL twin equals the Spark fixpoint whenever the
  * fixpoint is reached within R rounds, because extra rounds are
  * no-ops. Convergence within `maxRounds` is asserted loudly (the
  * ConnectedComponents / IncrementalAgg precedent): silently returning
  * a part-peeled set would claim nodes are in the core that are not.
  *
  * Scale shape: each round is two semi-joins of the symmetrized edge
  * list against the compact alive set (node ids only — no neighbor
  * lists materialize in memory, unlike neighborhood-collect
  * formulations) plus one count aggregate; all shuffles carry ids.
  * Rounds = peel depth, typically O(log n) on heavy-tailed graphs and
  * 1–4 on clique-union graphs like co-purchase hours. The edge list is
  * persisted once and reused every round; every round ends in
  * `localCheckpoint()` so lineage stays depth-1 (swap for durable
  * `checkpoint()` on a real cluster).
  */
object KCore {

  /** Peel to the k-core.
    *
    * @param edges undirected edge list, each pair listed once
    * @param k minimum degree inside the surviving subgraph
    * @param maxRounds loud upper bound on peel rounds
    * @return (node, core_deg) for exactly the k-core members, where
    *   core_deg is the degree within the core (>= k by construction)
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, maxRounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    var alive = sym.select(col("a").as("node")).distinct().barrier()
    var aliveN = alive.count()
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxRounds) {
      rounds += 1
      val next = aliveDegrees(sym, alive)
        .filter(col("core_deg") >= k)
        .select(col("node"))
        .barrier()
      val n = next.count()
      // the alive set only shrinks, so equal cardinality == equal set
      stable = n == aliveN
      aliveN = n
      alive = next
    }
    if (!stable)
      throw new IllegalStateException(
        s"k-core peel did not converge within $maxRounds rounds " +
          s"(still $aliveN alive) — raise maxRounds; a truncated peel " +
          "would misreport non-core nodes as core members")
    val out = aliveDegrees(sym, alive)
    sym.unpersist()
    out
  }

  /** Degrees restricted to the alive subgraph: count of sym edges
    * whose BOTH endpoints are alive, per surviving source. */
  private def aliveDegrees(sym: DataFrame, alive: DataFrame): DataFrame =
    sym
      .join(alive, sym("a") === alive("node")).drop("node")
      .join(alive.withColumnRenamed("node", "nb"), col("b") === col("nb"))
      .drop("nb")
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("core_deg"))
}
