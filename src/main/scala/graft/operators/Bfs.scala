package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Bounded multi-source BFS distances (SURVEY.md §2.11a X40) — the
  * hop-distance primitive behind influence radius, blast-radius
  * analysis, and "within-k-hops of a seed set" cohort extraction over
  * entity graphs (q108 counts triangles, q109 ranks, q82/q96 collapse
  * components; this one MEASURES distance).
  *
  * Frontier expansion, not matrix iteration: each round joins only the
  * NEW frontier against the edge list, anti-joins away already-labeled
  * nodes, and unions the survivors into the distance table. Work per
  * round is proportional to the frontier's edge neighborhood — on
  * small-diameter graphs most rounds touch a tiny fraction of the
  * graph, which is why BFS-by-frontier beats whole-graph label
  * iteration for distance queries. Distances are exact small integers,
  * so results are bit-identical on any engine or partitioning.
  *
  * Scale shape: the undirected edge list is persisted once and reused
  * every round; each round is two equi-joins on compact node ids (the
  * frontier side is small and broadcast-eligible; AQE picks it up) plus
  * a min-aggregate over the new frontier. Every round ends in
  * `localCheckpoint()` — the ConnectedComponents lesson: without
  * truncation the plan nests one join DEEPER per round and a lost
  * partition at round k replays all k rounds. At cluster scale swap
  * for `checkpoint()` with a durable dir.
  */
object Bfs {

  /** @param sources (idCol) seed rows, distance 0
    * @param edges undirected edge list (each pair listed once; both
    *   directions derived here)
    * @param maxHops inclusive hop bound — BFS stops early when a
    *   round's frontier is empty
    * @return (idCol, dist) for every node within `maxHops` of a seed */
  def distances(sources: DataFrame, idCol: String,
                edges: DataFrame, srcCol: String, dstCol: String,
                maxHops: Int): DataFrame = {
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    var dist = sources.select(col(idCol).as("node"), lit(0L).as("dist"))
      .barrier()
    var frontier = dist
    var hop = 0
    var frontierSize = frontier.count()
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val nbrs = frontier.join(und, frontier("node") === und("a"))
        .select(und("b").as("node"), lit(hop.toLong).as("dist"))
      // nodes seen in an earlier (therefore shorter) round never re-enter
      val newFrontier = nbrs.join(dist, Seq("node"), "left_anti")
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .barrier()
      frontierSize = newFrontier.count()
      // dist is a UNION of already-checkpointed frontiers — depth-1
      // lineage by construction, so it needs no checkpoint of its own
      // (one materialization job per round saved vs checkpointing it)
      dist = dist.unionByName(newFrontier)
      frontier = newFrontier
    }
    und.unpersist()
    dist.withColumnRenamed("node", idCol)
  }

  /** Per-source BFS distances in ONE traversal: every frontier row
    * carries its origin tag, so k sources cost the same 6 rounds as
    * one (frontier rows multiply by k, jobs do not). This is the
    * closeness/ego-network form — `distances` above answers "how far
    * from the NEAREST seed", this answers "how far from EACH seed".
    *
    * Scale: frontier cardinality is bounded by |sources| x |nodes|;
    * keep the source set bounded (centrality samples, ego queries) —
    * all-pairs BFS is O(V^2) state no engine should materialize.
    *
    * @return (tagCol, idCol, dist) — one row per (source, reachable node) */
  def distancesPerSource(sources: DataFrame, tagCol: String, idCol: String,
                         edges: DataFrame, srcCol: String, dstCol: String,
                         maxHops: Int): DataFrame = {
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist()
    var dist = sources
      .select(col(tagCol).as("tag"), col(idCol).as("node"), lit(0L).as("dist"))
      .barrier()
    var frontier = dist
    var hop = 0
    var frontierSize = frontier.count()
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val nbrs = frontier.join(und, frontier("node") === und("a"))
        .select(col("tag"), und("b").as("node"), lit(hop.toLong).as("dist"))
      val newFrontier = nbrs.join(dist, Seq("tag", "node"), "left_anti")
        .groupBy(col("tag"), col("node")).agg(min(col("dist")).as("dist"))
        .barrier()
      frontierSize = newFrontier.count()
      dist = dist.unionByName(newFrontier)
      frontier = newFrontier
    }
    und.unpersist()
    dist.withColumnRenamed("tag", tagCol).withColumnRenamed("node", idCol)
  }
}
