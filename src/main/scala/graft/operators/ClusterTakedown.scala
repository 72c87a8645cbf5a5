package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Near-dup CLUSTER-STORE takedown (SURVEY.md §2.11a X107 / q242):
  * remove an id set from a signature near-dup store (the q217/q232
  * HammingJoin.collapsed + labelStar artifact) and return the
  * survivors' corrected cluster labels — WITHOUT re-clustering the
  * corpus.
  *
  * Why this is not an anti-join: deletion breaks the store's two
  * invariants in ways no row filter can fix —
  *  - REPRESENTATIVE re-election: a signature group's rep is its min
  *    id; delete the rep and the group needs a new one (and every
  *    label derived from rep ids shifts with it);
  *  - COMPONENT SPLITS: the hamming pair graph lives between
  *    SIGNATURES, so deleting ids only matters where a signature
  *    VANISHES entirely — and a vanished signature can be the bridge
  *    holding a component together (A–B–C within k pairwise only
  *    through B: delete all of B's copies and {A}, {C} must split).
  *
  * The incremental shape exploits exactly that: components with no
  * vanished signature keep their member set (only the min-surviving-id
  * label needs recomputing — one aggregate); components containing a
  * vanished signature — O(touched), not O(corpus) — re-close with
  * labelStar over their SURVIVING re-elected reps and the rep pairs
  * mapped through the re-election (pairs between surviving signatures
  * are unchanged truths; pairs with a vanished endpoint drop).
  *
  * Law (ClusterTakedownSpec + q242's oracle): maintained ≡ rebuilt —
  * the output equals HammingJoin.collapsed + labelStar run from
  * scratch on the surviving rows. The oracle never sees the
  * incremental structure (q139/q213's device).
  *
  * Scale: one anti-join flag pass, one per-group re-election
  * aggregate, the labelStar that built the store (already-paid at
  * build time; here restricted to touched components), one window
  * min for untouched labels. The empty-touched fast path skips the
  * re-closure subplan entirely (the r8 empty-branch lesson: an empty
  * branch still costs stages and rescans unless guarded).
  */
object ClusterTakedown {

  /** `(id, component)` for every SURVIVING id, labels equal to a full
    * re-cluster of the survivors. `hashes`: the store's (idCol,
    * sigCol) rows — the same frame the store was built from. */
  def removeFromClusters(hashes: DataFrame, idCol: String, sigCol: String,
                         deletedIds: DataFrame, k: Int, bits: Int): DataFrame = {
    val (repPairs, members) = HammingJoin.collapsed(hashes, idCol, sigCol, k, bits)
    val mem = members.barrier() // (rep, id)
    val del = deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("id"))
      .distinct().withColumn("__del", lit(1L))
    val memF = mem.join(del, Seq("id"), "left_outer")
      .withColumn("__del", coalesce(col("__del"), lit(0L)))
      .barrier()
    // re-election: min surviving member per signature group (null =
    // the signature VANISHED — its node leaves the pair graph)
    val regroup = memF.groupBy(col("rep"))
      .agg(min(when(col("__del") === 0L, col("id"))).as("new_rep"))
      .barrier()
    // the store's own closure (exists at build time; recomputed here
    // because the query is self-contained)
    val oldComp = ConnectedComponents.labelStar(
      mem.select(col("rep")).distinct(), "rep", repPairs, "rep_a", "rep_b")
      .barrier()
    val touchedComps = oldComp
      .join(regroup.filter(col("new_rep").isNull), Seq("rep"))
      .select(col("component")).distinct().barrier()
    val survivors = memF.filter(col("__del") === 0L)
      .join(oldComp, Seq("rep")) // (id, rep, component)
    // untouched components: same member set, label = min surviving id.
    // groupBy + join back (the same device as the re-election at
    // `regroup` above), NOT a member-level window: a viral component
    // is exactly ONE window partition, so
    // min().over(partitionBy(component)) would sort a million member
    // rows in a single task. The aggregate is map-side combinable
    // (skew-immune). NO broadcast() hint on the join-back (ADVICE
    // r14): the label table is one row per untouched component, which
    // on a mostly-unique corpus is O(corpus) — a forced broadcast
    // would OOM exactly at the scale this path serves. AQE picks the
    // strategy at runtime: broadcast when the table is actually small
    // (the dedup-store case: components ≪ corpus), shuffle join with
    // skew split otherwise — viral keys are the skew-join class AQE
    // already handles.
    // no barrier: both consumers re-derive this from already-barriered
    // parents with one cheap anti-join — cheaper than materializing a
    // member-sized frame
    val untouchedSurv = survivors
      .join(touchedComps, Seq("component"), "left_anti")
    val untouchedLabels = untouchedSurv.groupBy(col("component"))
      .agg(min(col("id")).as("__nc"))
    val untouchedLabeled = untouchedSurv
      .join(untouchedLabels, Seq("component"))
      .select(col("id"), col("__nc").as("component"))
    val touchedReps = regroup.filter(col("new_rep").isNotNull)
      .join(oldComp, Seq("rep")).join(touchedComps, Seq("component"))
      .select(col("rep"), col("new_rep")).barrier()
    if (touchedReps.isEmpty) untouchedLabeled // empty-branch early-out
    else {
      // pairs between surviving signatures inside touched components,
      // endpoints mapped through the re-election
      val mappedPairs = repPairs
        .join(touchedReps.select(col("rep").as("rep_a"),
          col("new_rep").as("__na")), Seq("rep_a"))
        .join(touchedReps.select(col("rep").as("rep_b"),
          col("new_rep").as("__nb")), Seq("rep_b"))
        .select(col("__na").as("rep_a"), col("__nb").as("rep_b"))
      val reclosed = ConnectedComponents.labelStar(
        touchedReps.select(col("new_rep").as("rep")).distinct(), "rep",
        mappedPairs, "rep_a", "rep_b")
      val touchedLabeled = survivors.join(touchedComps, Seq("component"))
        .join(regroup.select(col("rep"), col("new_rep")), Seq("rep"))
        .join(reclosed.select(col("rep").as("new_rep"),
          col("component").as("__nc")), Seq("new_rep"))
        .select(col("id"), col("__nc").as("component"))
      untouchedLabeled.unionByName(touchedLabeled)
    }
  }
}
