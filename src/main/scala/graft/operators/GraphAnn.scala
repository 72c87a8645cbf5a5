package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Data-parallel best-first beam search over a KNN graph (SURVEY.md
  * §2.11a N48 / q238) — the QUERY path for the q201 NN-Descent graph,
  * completing the graph-index story: q201 builds the navigable
  * structure HNSW/NSG-class indexes are made from, this serves it.
  *
  * All queries advance SIMULTANEOUSLY (the data-parallel shape — a
  * per-query sequential walk would be a driver loop): each round takes
  * every query's `beam` best not-yet-expanded candidates, expands them
  * through the symmetrized edge table in ONE equi-join, scores only
  * NEVER-SEEN (query, node) pairs with exact grid distances, and
  * folds them into the seen set. After `rounds` rounds the answer is
  * the exact top-k of everything seen. Greedy best-first with
  * full-memory frontier selection — the standard graph-ANN search
  * (HNSW's ef-search) re-expressed as bounded relational rounds.
  *
  * Determinism: distances are exact BIGINTs on the
  * [[KMeansInt.quantize]] grid, every per-query top (frontier and
  * answer) ties (d ASC, id ASC), and the expanded/seen sets evolve as
  * pure functions of those — the whole search hash-matches its rounds
  * unrolled as CTEs (q201's device).
  *
  * Scale: per round, frontier = queries × beam rows; expansion is one
  * join against the (2·k·N)-row edge table on the node key; scoring
  * moves vectors only for FRESH candidates (≤ queries × beam × degree
  * per round, corpus-size-independent); the seen set is bounded by
  * the total scored budget (entries + rounds × beam × degree per
  * query), never the corpus. Accumulators (`expanded`) stay plain
  * unions of barriered leaves — never themselves checkpointed (the
  * r9 union-checkpoint lesson).
  */
object GraphAnn {

  private def topPerQ(df: DataFrame, k: Int): DataFrame = {
    implicit val inEnc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Double, Long, Long)]()
    val topk = udaf(new graft.functions.TopKScored(k))
    df.groupBy(col("q_id"))
      .agg(topk((-col("d")).cast("double"), col("id"), col("d")).as("nn"))
      .select(col("q_id"), explode(col("nn")).as("e"))
      .select(col("q_id"), col("e.id").as("id"), col("e.tag").as("d"))
  }

  /** Graph-index APPEND (X105 / q240 — the maintenance family's graph
    * member): new nodes acquire their k out-edges by beam-searching
    * the FROZEN graph — HNSW's own insert algorithm (search, then
    * connect), minus the sequential insert order that keeps HNSW off
    * data-parallel engines: every delta node searches the SAME frozen
    * structure simultaneously, so the append is deterministic,
    * order-free (sub-batch composable), and O(|delta| × search
    * budget) — the frozen graph and corpus are probed, never
    * rewritten.
    *
    * Documented asymmetry (the T22/T24 caveat class): REVERSE edges —
    * an existing node whose true neighborhood now includes a delta
    * node — are NOT patched (that would rewrite frozen rows); they
    * reconcile at the next NN-Descent rebuild generation (the lambda
    * posture). Delta-delta edges likewise: two near-identical arrivals
    * each connect into the frozen corpus, not to each other.
    *
    * Returns `(v, rn, u, d)` edge rows for the delta nodes —
    * schema-identical to [[NNDescent.build]]'s output, so the union
    * IS the maintained graph. */
  def appendNodes(vq: DataFrame, idCol: String, graph: DataFrame,
                  delta: DataFrame, entries: DataFrame,
                  beam: Int, rounds: Int, k: Int): DataFrame =
    beamSearch(vq, idCol, graph,
      delta.select(col(idCol).as("q_id"), col("xq")),
      entries, beam, rounds, k)
      .select(col("q_id").as("v"), col("rn"), col("id").as("u"), col("d"))

  /** Graph-index TAKEDOWN (X106 / q241): drop a node set from the KNN
    * graph — both as sources and as targets (a deleted node must stop
    * being served AND stop being anyone's neighbor: its vectors are
    * gone, q234's right-to-be-forgotten contract). Returns
    * `(live, degradeLedger)`: the surviving edge rows (pure anti-joins
    * — exact by construction, no model involved) and the per-surviving-
    * node degree ledger `(v, n_before, n_lost, n_live)` — a node that
    * lost neighbors serves a DEGRADED neighborhood until the next
    * rebuild generation re-densifies it; the ledger is what a serving
    * layer alarms on (sum(n_lost) / sum(n_before) is the rebuild
    * trigger, q222's cell_dist posture). */
  def removeNodes(graph: DataFrame, deletedIds: DataFrame)
      : (DataFrame, DataFrame) = {
    val del = deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("__did"))
      .distinct()
    val live = graph
      .join(del.select(col("__did").as("v")), Seq("v"), "left_anti")
      .join(del.select(col("__did").as("u")), Seq("u"), "left_anti")
      .select(graph.columns.map(col): _*)
    val ledger = graph
      .join(del.select(col("__did").as("v")), Seq("v"), "left_anti")
      .join(del.select(col("__did").as("u"), lit(1L).as("__gone")),
        Seq("u"), "left_outer")
      .withColumn("__gone", coalesce(col("__gone"), lit(0L)))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_before"), sum(col("__gone")).as("n_lost"),
        sum(lit(1L) - col("__gone")).as("n_live"))
    (live, ledger)
  }

  /** Lost-edge fraction (ppm) of a [[removeNodes]] degradation ledger
    * — the graph reaper's scheduling input (the rebuild trigger the
    * ledger scaladoc promises; packing/index twins:
    * `GenerationRollover.deadFractionPpm` / `IvfPqIndex
    * .deadFractionPpm`). One aggregate over the per-node ledger; the
    * 1-row collect is the sanctioned reduced-aggregate class. Sums in
    * DECIMAL(38,0) so the ×10⁶ ppm step cannot overflow BIGINT at
    * 100 TB edge counts (quotient floored back to BIGINT — see
    * GenerationRollover.deadFractionPpm for the scale argument). */
  def lostFractionPpm(ledger: DataFrame): Long =
    ledger.agg(coalesce(
        expr("sum(cast(n_lost as decimal(38,0))) * 1000000 div " +
          "sum(cast(n_before as decimal(38,0)))"), lit(0L))
        .as("ppm"))
      .head().getLong(0)

  /** Beam search: `(q_id, rn, id, d)` — the exact top-k of everything
    * the search visited, rn = 1..k by (d ASC, id ASC); self-matches
    * (id = q_id) excluded from the answer (IvfAnn.topK's contract).
    *
    * @param vq      corpus (idCol, xq) on the quantized grid
    * @param graph   directed KNN edges (v, u) — symmetrized internally
    * @param queries (q_id, xq)
    * @param entries single-column entry-point ids (a fixed, small,
    *                deterministic set — HNSW's fixed entry, broadcast)
    */
  def beamSearch(vq: DataFrame, idCol: String, graph: DataFrame,
                 queries: DataFrame, entries: DataFrame,
                 beam: Int, rounds: Int, k: Int): DataFrame = {
    // distinct enforces (not assumes) the fixed-small-entry-set
    // contract: duplicate entry ids would otherwise occupy multiple
    // beam slots in round 1, silently shrinking the effective beam
    val ent = entries.select(col(entries.columns.head).as("id")).distinct()
    val seeds = queries.select(col("q_id")).crossJoin(broadcast(ent))
    beamSearchFrom(vq, idCol, graph, queries, seeds, beam, rounds, k)
  }

  /** [[beamSearch]] with PER-QUERY seed rows `(q_id, id)` instead of a
    * global entry set — the lower-layer leg of a hierarchical search
    * (q280): each query starts from the entry points its upper-layer
    * descent chose for it. Same algebra from the seeds on. */
  def beamSearchFrom(vq: DataFrame, idCol: String, graph: DataFrame,
                     queries: DataFrame, seeds: DataFrame,
                     beam: Int, rounds: Int, k: Int): DataFrame = {
    // NOT barriered (r18 optimization note): score() joins the corpus
    // once per round, so an EXPENSIVE vq lineage replays rounds+1
    // times — but the fix belongs at the call site (q318/q320 barrier
    // their failover-routed vq once), because most callers pass a
    // select off an already-persisted frame and an unconditional
    // corpus checkpoint here measured ~1-1.5 s SLOWER per query
    // (q201/q238/q240/q250/q280, sf0.1) than the cheap replays.
    val corpus = vq.select(col(idCol).as("id"), col("xq").as("__cx"))

    // exact grid distances for (q_id, id) candidate rows
    def score(cand: DataFrame, qx: DataFrame): DataFrame = cand
      .join(corpus, "id")
      .join(qx, "q_id")
      .select(col("q_id"), col("id"),
        KMeansInt.sqDist(col("__qx"), col("__cx")).as("d"))

    // the edge symmetrization and the query-vector + seed-scoring
    // chains are independent eager stages — overlap them (guide §2.6,
    // r19); seed scoring needs qx, so it rides qx's leg
    val (sym, (qx, seen0)) = graft.core.Par.join2(
      graph.select(col("v"), col("u"))
        .unionByName(graph.select(col("u").as("v"), col("v").as("u")))
        .filter(col("v") =!= col("u")).distinct().barrier(),
      { val q = queries.select(col("q_id"), col("xq").as("__qx")).barrier()
        (q, score(seeds.select(col("q_id"), col("id")).distinct(), q)
          .barrier()) })

    var seen = seen0
    var expanded: DataFrame = null // plain union of barriered leaves
    (1 to rounds).foreach { _ =>
      val unexpanded =
        if (expanded == null) seen
        else seen.join(expanded, Seq("q_id", "id"), "left_anti")
      // LAZY round barriers (r19): under AQE the checkpoint's shuffle
      // stages already run at construction; eager only adds a separate
      // result-write job per barrier. Lazy folds that write into the
      // consumer's job — same plans, same truncation, one job less per
      // round. (toExpand's two consumers both live in the seen-barrier
      // job; seen's consumer is the next round's construction.)
      val toExpand = topPerQ(unexpanded, beam).barrier(eager = false)
      val exp = toExpand.select(col("q_id"), col("id"))
      expanded = if (expanded == null) exp else expanded.unionByName(exp)
      val nbrs = toExpand.select(col("q_id"), col("id").as("v"))
        .join(sym, "v")
        .select(col("q_id"), col("u").as("id")).distinct()
      val fresh = nbrs
        .join(seen.select(col("q_id"), col("id")), Seq("q_id", "id"),
          "left_anti")
      seen = seen.unionByName(score(fresh, qx))
        .groupBy(col("q_id"), col("id")).agg(min(col("d")).as("d"))
        .barrier(eager = false) // aggregate-topped, never a bare Union
    }
    implicit val inEnc = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Double, Long, Long)]()
    val topk = udaf(new graft.functions.TopKScored(k))
    seen.filter(col("id") =!= col("q_id"))
      .groupBy(col("q_id"))
      .agg(topk((-col("d")).cast("double"), col("id"), col("d")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")).as(Seq("i", "e")))
      .select(col("q_id"), (col("i") + 1).as("rn"),
        col("e.id").as("id"), col("e.tag").as("d"))
  }
}
