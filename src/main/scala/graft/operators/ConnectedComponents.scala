package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

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
    *   hot but the logical plan still chains through every prior round —
    *   the plan grows ~3× per round (labels is referenced on both union
    *   arms), driver-side ANALYSIS re-walks it on every Dataset
    *   construction, and a lost partition at round k recomputes all k
    *   rounds; checkpointing materializes the RDD and truncates lineage.
    *   Default 1 (measured equal-or-faster than 5 even at 3-4 rounds;
    *   see [[labelStar]]'s scaladoc for the 4×-growth variant where the
    *   difference is 8×). Use checkpoint-with-dir on a real cluster for
    *   executor-loss tolerance; localCheckpoint is the single-JVM form.
    * @return (idCol, "component") — component = min node id reachable */
  def label(nodes: DataFrame, idCol: String,
            edges: DataFrame, srcCol: String, dstCol: String,
            maxRounds: Int = 20, checkpointInterval: Int = 1): DataFrame = {
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
        if ((round + 1) % checkpointInterval == 0) observed.barrier()
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

  /** Connected components by the ALTERNATING large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC '14) — the scale upgrade over [[label]] for graphs
    * whose diameter is not small: rounds are O(log² n) in the worst
    * case (in practice a handful) instead of O(diameter), because each
    * round REWIRES edges toward the component minimum rather than
    * propagating labels one hop.
    *
    *   large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    *   small-star(u): over edges (u, v) canonical u > v:
    *                  m = min(N(u)); emit (v, m) for v ∈ N(u) ∪ {u} \ {m}
    *
    * Both steps preserve connectivity and never raise any node's
    * minimum reachable label (the paper's Lemmas 1-2); the fixed point
    * is a forest of stars rooted at each component's minimum id.
    *
    * Implementation notes (Spark-first, no collect_list): each star
    * step is a window-min over the neighbor partition — the
    * neighborhood is never materialized as an array, so a viral node
    * with 10⁷ neighbors costs a sort+scan, not an executor-memory
    * array. Shuffles are all on compact long keys. Convergence =
    * (edge count, xxhash64 edge-set checksum) unchanged across a
    * round — one driver-side pair compare per round against the
    * materializing count; a false stop needs a 64-bit checksum
    * collision at equal cardinality (~2⁻⁶⁴ — negligible, and both
    * star steps are deterministic so a stop is reproducible).
    *
    * Lineage is truncated with localCheckpoint every round by default
    * (`checkpointInterval = 1`), a stricter default than [[label]]'s:
    * each star round references the previous edge frame FOUR times
    * (two symmetrization arms × two window stages), so the un-truncated
    * logical plan grows ~4× per round and driver-side ANALYSIS — which
    * runs on every Dataset construction, cached data or not — becomes
    * the bottleneck within a handful of rounds (measured 60 s → 14 s on
    * a 135k-edge graph just by truncating every round).
    *
    * Use [[label]] for near-dup clusters (tiny diameter — fewer
    * shuffles per round wins); use this for social-graph-shaped
    * components where diameter ≈ 20+ makes per-hop propagation the
    * bottleneck.
    *
    * @return (idCol, "component") — component = min node id reachable */
  def labelStar(nodes: DataFrame, idCol: String,
                edges: DataFrame, srcCol: String, dstCol: String,
                maxRounds: Int = 30, checkpointInterval: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // (count, checksum) signature of a canonical edge frame; the head()
    // action is also what materializes the persist/checkpoint. The
    // checksum sums full-range xxhash64 longs as DECIMAL(38,0) — an
    // overflow-safe, order-independent exact sum under ANSI mode.
    def sig(e: DataFrame): (Long, String) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))), lit(0))).head()
      (r.getLong(0), String.valueOf(r.get(1)))
    }

    // canonical (u = bigger, v = smaller), self-loops and dups dropped
    var e = edges.select(
        greatest(col(srcCol), col(dstCol)).cast("long").as("u"),
        least(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().persist()
    var eSig = sig(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star over the symmetrized neighborhoods. No dedup here:
      // duplicate (v, m) edges don't change the small-star window min,
      // and the end-of-round distinct removes them — one less shuffle.
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val large = sym
        .withColumn("m", least(min(col("v")).over(Window.partitionBy("u")), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star over the (already canonical) large-star output.
      // ONE pass over the window result: the textbook form unions a
      // filter arm {(v,m): v ≠ m} with a projection arm {(u,m)} — two
      // plan branches referencing the same window, which Spark plans as
      // TWO window sorts (no CSE across union arms; measured ~25% of
      // the round). Every u-group attains its min on ≥ 1 row (v = m),
      // so emitting (u,m) FROM those rows and (v,m) from the rest
      // yields the identical edge SET after the round's distinct,
      // with the window materialized once.
      val withMin = large.withColumn("m", min(col("v")).over(Window.partitionBy("u")))
      val small = withMin
        .select(when(col("v") =!= col("m"), col("v")).otherwise(col("u")).as("u"),
          col("m").as("v"))
        .distinct() // no self-edges possible: m ≤ v < u on every row
      // LAZY checkpoint: sig()'s head() — which touches every partition
      // — is the materializing action, so each round runs ONE job, not
      // an eager-checkpoint job plus the signature job (r19; the same
      // one-job-per-round discipline label() gets from observe())
      val next =
        if ((round + 1) % checkpointInterval == 0) small.barrier(eager = false)
        else small.persist()
      val nextSig = sig(next)
      e.unpersist()
      converged = nextSig == eSig
      e = next
      eSig = nextSig
      round += 1
    }
    require(converged,
      s"star connected components did not converge within $maxRounds rounds; " +
        "raise maxRounds — partial edges would mislabel components")
    // fixed point is a star forest: every non-root points at its root; roots
    // and isolated nodes label themselves.
    nodes.select(col(idCol).cast("long").as("node"))
      .join(e.groupBy(col("u").as("node")).agg(min(col("v")).as("root")),
        Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("root"), col("node")).as("component"))
  }
}
