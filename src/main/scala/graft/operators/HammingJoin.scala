package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hamming-distance similarity self-join over fixed-width bit
  * signatures (SURVEY.md §2 MM2's pair step — perceptual image hashes;
  * the same join serves SimHash fingerprints or any ≤63-bit signature).
  *
  * The pigeonhole device (q55/q131's family): split the `bits`
  * positions into k+1 bands; two signatures within hamming distance k
  * differ in ≤ k positions, so AT LEAST ONE band is untouched and the
  * pair surfaces as an exact equi-join match on (band, band-bits) —
  * recall is exact, no scheme tuning. Bands take INTERLEAVED positions
  * (`pos mod k+1` — q131's lesson: contiguous cuts hand low-entropy
  * prefix regions to one key and recreate the viral bucket; the DuckDB
  * twin deliberately bands CONTIGUOUSLY, so the two engines agree
  * through different blockings). Candidates are verified with the
  * exact `bit_count(a XOR b)`, so blocking choices cannot change the
  * result — bit-identical to the all-pairs definition.
  *
  * Exact-group-first (EdJoin's enforced device): identical signatures —
  * the meme-image regime where ONE popular image has millions of
  * byte-identical copies — collapse to a representative BEFORE banding,
  * so band buckets and the verify see distinct signatures only;
  * within-group pairs expand back at distance 0 without ever being
  * banded or verified. The residual skew is a band VALUE shared by many
  * DISTINCT signatures (a low-entropy hash region); at corpus scale
  * that calls for the q54 viral-bucket cap on the band key — documented
  * rather than silently applied, because unlike LSH candidates, hamming
  * pairs are exact truths a cap would DROP.
  *
  * Scale shape: one tiny aggregate (distinct signatures), k+1 band rows
  * per distinct signature, one equi-join on the (band, value) key, a
  * distinct on representative pairs, the popcount verify on candidates
  * only, and two member-expansion joins. Never a cross product; output
  * size is the truth's own size.
  */
object HammingJoin {

  /** Per-ROW banded projection of a signature column: an array of k+1
    * band values, entry j packing the bits at positions ≡ j (mod k+1)
    * compacted to the low bits — bit-identical to the interleaved
    * pigeonhole [[collapsed]] joins on (HammingJoinSpec pins the
    * probe-consistency law). This is the STREAMING-PROBE surface
    * (T24's device, mirroring `MinHashLSH.bandedSignatureArr`): a
    * frozen corpus explodes it once into a banded inverted index, and
    * each arriving row computes its own band array statelessly and
    * equi-joins — no per-batch re-banding of the corpus. Signatures
    * are masked to the low `bits` bits, matching [[collapsed]]. */
  def bandValuesExpr(hashCol: String, k: Int, bits: Int): org.apache.spark.sql.Column = {
    require(k >= 0 && bits >= k + 1 && bits <= 63,
      s"HammingJoin: need 0 <= k < bits <= 63 (got k=$k, bits=$bits)")
    val nBands = k + 1
    val mask = (1L << bits) - 1
    expr(
      s"transform(sequence(0, $k), band -> " +
        s"aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, i) -> " +
        s"IF(i % $nBands = band AND " +
        s"(shiftright(CAST($hashCol AS BIGINT) & ${mask}L, i) & 1) = 1, " +
        s"acc | shiftleft(CAST(1 AS BIGINT), CAST(i DIV $nBands AS INT)), " +
        s"acc)))")
  }

  /** Representative-level surface (r12 — the q217 viral-image path):
    * `(repPairs, members)` where `repPairs` has one `(rep_a, rep_b,
    * dist)` row per DISTINCT-SIGNATURE pair within hamming distance
    * 1..k (dist ≥ 1 — equal signatures share a representative) and
    * `members` maps every input id to its signature's representative
    * (`min(id)` per distinct signature). Consumers that only need
    * cluster structure (dedup collapse, component labeling over
    * near-dup images) should stay at THIS level: a meme image with a
    * million byte-identical copies is ONE row here, while [[join]]'s
    * expanded pair set is quadratic in that group size by definition.
    * HammingJoinSpec pins expand(collapsed) == join.
    *
    * `idCol` values must be unique non-null; `hashCol` is a non-null
    * integral signature. Signatures are MASKED to the low `bits` bits
    * (1 ≤ bits ≤ 63) — bits above the declared width cannot influence
    * banding, verification, or reported distances (r11 ADVICE: the
    * contract is now enforced, not assumed).
    */
  def collapsed(hashes: DataFrame, idCol: String, hashCol: String,
                k: Int, bits: Int): (DataFrame, DataFrame) = {
    require(k >= 0 && bits >= k + 1 && bits <= 63,
      s"HammingJoin: need 0 <= k < bits <= 63 (got k=$k, bits=$bits)")
    val nBands = k + 1
    // (1L << 63) - 1 is Long.MaxValue by two's-complement wraparound,
    // so the mask is correct across the whole 1..63 domain
    val mask = (1L << bits) - 1
    val s = hashes.select(col(idCol).as("__id"),
      expr(s"CAST($hashCol AS BIGINT) & ${mask}L").as("__h"))

    // exact-group-first: one representative per distinct signature
    val reps = s.groupBy(col("__h")).agg(min(col("__id")).as("__rep"))
    val members = s.join(reps, Seq("__h")).select(col("__rep"), col("__id"))

    // k+1 interleaved bands per DISTINCT signature: band j packs the
    // bits at positions p ≡ j (mod k+1), compacted to the low bits
    val bands = reps
      .select(col("__h"), col("__rep"),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("__band"))
      .withColumn("__bval", expr(
        s"aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, i) -> " +
          s"IF(i % $nBands = __band AND (shiftright(__h, i) & 1) = 1, " +
          s"acc | shiftleft(CAST(1 AS BIGINT), CAST(i DIV $nBands AS INT)), " +
          s"acc))"))

    val a = bands.select(col("__band"), col("__bval"),
      col("__rep").as("__ra"), col("__h").as("__ha"))
    val b = bands.select(col("__band"), col("__bval"),
      col("__rep").as("__rb"), col("__h").as("__hb"))
    // distinct signatures => xor != 0 => dist >= 1 here; dist-0 pairs
    // are exactly the within-group expansions below
    val repPairs = a.join(b, Seq("__band", "__bval"))
      .filter(col("__ra") < col("__rb"))
      .select(col("__ra"), col("__rb"), col("__ha"), col("__hb"))
      .distinct()
      .withColumn("dist", expr("CAST(bit_count(__ha ^ __hb) AS INT)"))
      .filter(col("dist") <= k)

    (repPairs.select(col("__ra").as("rep_a"), col("__rb").as("rep_b"),
        col("dist")),
      members.select(col("__rep").as("rep"), col("__id").as("id")))
  }

  /** All `(a_id, b_id, dist)` with `a_id < b_id` and
    * `bit_count(h_a XOR h_b) <= k`, without the all-pairs join: the
    * [[collapsed]] representative pairs expanded through the member
    * map — cross-signature pairs inherit the representatives'
    * distance, within-signature pairs surface at distance 0.
    */
  def join(hashes: DataFrame, idCol: String, hashCol: String,
           k: Int, bits: Int): DataFrame = {
    val (rp, mm) = collapsed(hashes, idCol, hashCol, k, bits)
    val repPairs = rp.select(col("rep_a").as("__ra"),
      col("rep_b").as("__rb"), col("dist"))
    val members = mm.select(col("rep").as("__rep"), col("id").as("__id"))

    val cross = repPairs
      .join(members.select(col("__rep").as("__ra"), col("__id").as("__ida")),
        "__ra")
      .join(members.select(col("__rep").as("__rb"), col("__id").as("__idb")),
        "__rb")
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"), col("dist"))
    val within = members.select(col("__rep"), col("__id").as("a_id"))
      .join(members.select(col("__rep"), col("__id").as("b_id")), Seq("__rep"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0).as("dist"))

    // disjoint by construction (cross pairs differ in signature, within
    // pairs share one) and each unique — no final distinct needed
    cross.unionByName(within)
  }
}
