package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Clip-level video near-dup clustering over a per-sampled-frame
  * perceptual-hash table (SURVEY.md §2 MM3 / q231; T24's frozen batch
  * half). Input `(clip_id, f, dhash, n_s)`: one row per clip and
  * sampled frame index, `n_s` = the clip's sampled-frame count.
  *
  * Semantics — TEMPORAL agreement: clips pair iff they have the same
  * sampled count AND every corresponding frame pair is within hamming
  * `k` (a re-encoded/damaged copy collapses; a clip merely sharing one
  * frame — an intro card — does not). Hashes are MASKED to the low
  * `bits` bits everywhere (banding, verify, signature identity),
  * matching [[HammingJoin.collapsed]]'s contract.
  *
  * Plan shape (r13 — replaced the per-frame-index subplan loop): ONE
  * `(f, band, bval)` equi-join, the same probe its streaming twin
  * `StreamingVideoDedup.assignBatch` runs. Width is constant in the
  * number of distinct frame indices F — for real video (a 30-minute
  * clip sampled at stride 2 → thousands of indices) the old F-branch
  * union was itself the bottleneck: O(F) driver planning time and F
  * re-filters of the hash table. No driver collect remains.
  *
  * Exact-group-first runs at TWO levels:
  *  - CLIP level: identical full signatures (same sampled indices,
  *    hashes, and count — the million-copy viral video) collapse to a
  *    `min(clip_id)` representative BEFORE any banding; [[collapsed]]
  *    exposes `(repPairs, members)` so cluster-structure consumers
  *    never pay the quadratic expansion (q217's image lesson).
  *  - FRAME level: banding and the popcount verify run on DISTINCT
  *    `(f, hash)` values only (the intro-card regime — one frame hash
  *    shared by thousands of distinct clips is banded and verified
  *    once); clip pairs attach by exact equi-join on `(f, hash)`
  *    afterwards, so expansion happens only for true per-frame
  *    agreement facts feeding the temporal-agreement aggregate.
  *
  * Scale: two aggregates (clip signatures, distinct frame hashes), one
  * banded self-equi-join on `(f, band, bval)` over distinct hashes,
  * popcount on candidate hash pairs only, two attach joins, one
  * agreement aggregate, labelStar over representative pairs. Never a
  * cross product; per-frame fan-out is the truth's own size.
  */
object VideoNearDup {

  /** Representative-level surface: `(repPairs, members)` where
    * `repPairs` has one `(rep_a, rep_b)` row per agreeing pair of
    * DISTINCT-signature representatives and `members` maps every
    * `clip_id` to its signature's representative (`min(clip_id)`).
    * Both frames are barriered (each is consumed by multiple joins
    * downstream). */
  def collapsed(frameHashes: DataFrame, k: Int, bits: Int): (DataFrame, DataFrame) = {
    require(k >= 0 && bits >= k + 1 && bits <= 63,
      s"VideoNearDup: need 0 <= k < bits <= 63 (got k=$k, bits=$bits)")
    val mask = (1L << bits) - 1
    // cast pins the contract for any integral `f`/`clip_id` width
    // (r12 ADVICE: a LongType frame index must not throw downstream)
    val fh = frameHashes.select(
      col("clip_id").cast("long").as("clip_id"),
      col("f").cast("int").as("f"),
      expr(s"CAST(dhash AS BIGINT) & ${mask}L").as("h"),
      col("n_s").cast("long").as("n_s"))

    // CLIP-level exact-group-first: the full ordered (f, h) signature
    // plus the declared count is the identity; one aggregate, key size
    // bounded by the sampled-frame count (a media-schema constant)
    val sigs = fh.groupBy(col("clip_id"))
      .agg(sort_array(collect_list(struct(col("f"), col("h")))).as("__sig"),
        max(col("n_s")).as("n_s"))
      .barrier()
    val reps = sigs.groupBy(col("__sig"), col("n_s"))
      .agg(min(col("clip_id")).as("rep"))
    val members = sigs.join(reps, Seq("__sig", "n_s"))
      .select(col("rep"), col("clip_id")).barrier()

    // representatives' frame rows only
    val rf = fh.join(
      members.filter(col("rep") === col("clip_id"))
        .select(col("rep").as("clip_id")),
      Seq("clip_id")).barrier()

    // FRAME-level exact-group-first: band + verify DISTINCT (f, h) only
    val distFH = rf.select(col("f"), col("h")).distinct()
    val banded = distFH
      .withColumn("__bands", HammingJoin.bandValuesExpr("h", k, bits))
      .select(col("f"), col("h"),
        posexplode(col("__bands")).as(Seq("band", "bval")))
      .barrier()
    // dist >= 1 hash pairs agreeing at frame f (the pigeonhole law:
    // <= k differing bits leave at least one of the k+1 bands intact)
    val hashPairs = banded
      .select(col("f"), col("band"), col("bval"), col("h").as("ha"))
      .join(banded.select(col("f"), col("band"), col("bval"),
        col("h").as("hb")), Seq("f", "band", "bval"))
      .filter(col("ha") < col("hb"))
      .select(col("f"), col("ha"), col("hb")).distinct()
      .filter(expr(s"bit_count(ha ^ hb) <= $k"))

    // attach clips by exact (f, hash) equi-join; a rep pair surfaces at
    // most ONCE per frame index (equal hashes -> `within`, differing ->
    // exactly one (ha, hb) row) and the branches are disjoint, so the
    // union feeds the agreement count without a distinct
    val cross = hashPairs
      .join(rf.select(col("f"), col("h").as("ha"), col("clip_id").as("ida"),
        col("n_s").as("na")), Seq("f", "ha"))
      .join(rf.select(col("f"), col("h").as("hb"), col("clip_id").as("idb"),
        col("n_s").as("nb")), Seq("f", "hb"))
      .filter(col("na") === col("nb"))
      .select(col("f"), least(col("ida"), col("idb")).as("a_id"),
        greatest(col("ida"), col("idb")).as("b_id"), col("na"))
    val within = rf
      .select(col("f"), col("h"), col("clip_id").as("a_id"), col("n_s").as("na"))
      .join(rf.select(col("f"), col("h"), col("clip_id").as("b_id"),
        col("n_s").as("nb")), Seq("f", "h"))
      .filter(col("a_id") < col("b_id") && col("na") === col("nb"))
      .select(col("f"), col("a_id"), col("b_id"), col("na"))

    // TEMPORAL agreement: every one of the n_s corresponding frames
    val repPairs = cross.unionByName(within)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("__c"), max(col("na")).as("__n"))
      .filter(col("__c") === col("__n"))
      .select(col("a_id").as("rep_a"), col("b_id").as("rep_b"))
      .barrier()
    (repPairs, members)
  }

  /** All agreeing clip pairs `(a_id, b_id)` with `a_id < b_id` —
    * [[collapsed]] expanded through the member map (quadratic in
    * identical-clip group size BY DEFINITION; cluster-structure
    * consumers should stay at the collapsed level). */
  def clipPairs(frameHashes: DataFrame, k: Int, bits: Int): DataFrame = {
    val (rp, members) = collapsed(frameHashes, k, bits)
    val cross = rp
      .join(members.select(col("rep").as("rep_a"), col("clip_id").as("ida")),
        "rep_a")
      .join(members.select(col("rep").as("rep_b"), col("clip_id").as("idb")),
        "rep_b")
      .select(least(col("ida"), col("idb")).as("a_id"),
        greatest(col("ida"), col("idb")).as("b_id"))
    val within = members.select(col("rep"), col("clip_id").as("a_id"))
      .join(members.select(col("rep"), col("clip_id").as("b_id")), Seq("rep"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    // disjoint (cross pairs differ in signature, within pairs share
    // one) and each internally unique — no distinct needed
    cross.unionByName(within)
  }

  /** `(clip_id, component)` — the clip graph closed by labelStar AT THE
    * REPRESENTATIVE LEVEL (members inherit their rep's component).
    * Identical to closing the expanded graph: a member's old component
    * was the min clip id reachable, which is the min of the reachable
    * reps' ids because every rep IS its group's min clip id. */
  def clusterClips(frameHashes: DataFrame, k: Int, bits: Int): DataFrame = {
    val (rp, members) = collapsed(frameHashes, k, bits)
    val repNodes = members.select(col("rep")).distinct()
    val repComp = ConnectedComponents.labelStar(repNodes, "rep",
      rp, "rep_a", "rep_b")
    members.join(repComp, "rep").select(col("clip_id"), col("component"))
  }
}
