package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** PageRank in EXACT integer fixed-point arithmetic — the canonical
  * iterative graph computation, formulated so a fixed iteration count
  * is bit-reproducible on any engine, any partitioning, any cluster
  * size (and therefore DuckDB-oracle-checkable, q109).
  *
  * Rank mass is carried as "micro-rank" longs (total mass = 10¹²) and
  * every step is integer arithmetic: a node's donation is
  * `rank div out_degree` (Spark SQL `div`, true integral division —
  * NOT `/`, which is double division and rounds), the damping step is
  * `(Σ donations · 85) div 100`, and the teleport base is a plan-time
  * Long constant. Integer sums are exact in any order, so the usual
  * iterative-double divergence (partial-aggregation order differs per
  * partitioning) cannot occur. Precision cost: each div truncates
  * ≤ 1 micro-unit per node per round — bounded drift of 10⁻¹² per
  * node-round against the real-valued fixed point, irrelevant for
  * ranking. Simplification (documented): danglers (out-degree 0)
  * leak their donated mass — the standard simplified variant; pass
  * symmetrized edges if the graph is undirected and no node dangles.
  *
  * Scale shape per round: one join of the rank frame onto edges (both
  * keyed by node id), one compact-key aggregation onto destinations,
  * one left join back to the node set; lineage truncated EVERY round
  * (the iterative-DataFrame analysis-cost lesson recorded in
  * [[ConnectedComponents.labelStar]]).
  */
object PageRank {

  val Scale = 1000000000000L // total rank mass, 10^12 micro-units

  /** (idCol, "rank_micro") after `iters` rounds, damping 0.85. */
  def ranksMicro(nodes: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String,
                 iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nd = nodes.select(col(idCol).cast("long").as("node")).distinct()
      .barrier()
    val n = nd.count()
    require(n > 0, "PageRank over an empty node set")
    val init = Scale / n
    val base = (Scale * 15L / 100L) / n
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val donors = e.join(outdeg, "src").barrier() // static per run
    var ranks = nd.select(col("node"), lit(init).as("r"))
    (1 to iters).foreach { _ =>
      val received = donors
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nd
        .join(received.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(coalesce(s, 0L) * 85) div 100")).as("r"))
        .barrier()
    }
    ranks.select(col("node").as(idCol), col("r").as("rank_micro"))
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): personalized
    * PageRank whose teleport mass lands ONLY on a trusted seed set —
    * rank then measures proximity-to-trust, the published device for
    * demoting spam domains in a crawl corpus. Same exact integer
    * fixed-point contract as [[ranksMicro]] (micro-units, `div`
    * truncation, bounded drift), so a fixed iteration count is
    * bit-reproducible and oracle-checkable: init mass Scale/|seeds| on
    * seeds (0 elsewhere), teleport base (Scale·15/100)/|seeds| on
    * seeds (0 elsewhere).
    *
    * @return (idCol, "trust_micro") after `iters` rounds */
  def trustMicro(nodes: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String,
                 seeds: DataFrame, seedCol: String,
                 iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nd = nodes.select(col(idCol).cast("long").as("node")).distinct()
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
    val ndFlag = nd
      .join(sd.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .barrier()
    val k = ndFlag.filter(col("is_seed")).count()
    require(k > 0, "TrustRank needs at least one seed inside the node set")
    val init = Scale / k
    val base = (Scale * 15L / 100L) / k
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val donors = e.join(outdeg, "src").barrier()
    var ranks = ndFlag.select(col("node"),
      when(col("is_seed"), lit(init)).otherwise(lit(0L)).as("r"))
    (1 to iters).foreach { _ =>
      val received = donors
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = ndFlag
        .join(received.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr("(coalesce(s, 0L) * 85) div 100")).as("r"))
        .barrier()
    }
    ranks.select(col("node").as(idCol), col("r").as("trust_micro"))
  }
}
