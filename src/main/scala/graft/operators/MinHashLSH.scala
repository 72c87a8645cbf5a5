package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.10 N10).
  *
  * Classic shingle → minhash → band → bucket-join pipeline (Broder '97).
  * The formulation is deliberately RELATIONAL, not nested-HOF:
  *
  *   1. per row: hashed word k-shingles as one array column — each
  *      token md5-hashed once, k-grams combined by base-31 polynomial
  *      (`shingleHashArr`). Built with arrays_zip so every subexpression
  *      evaluates once per ROW. (A nested-HOF signature formulation
  *      looks natural but is catastrophic: lambda bodies don't get
  *      common-subexpression elimination, and CollapseProject inlines
  *      the array into every element_at reference — measured 144×
  *      re-evaluation, 95 s for 6 000 docs. The relational form runs
  *      the same corpus in ~2 s.)
  *   2. explode → ONE codegen'd hash aggregation per doc computing all
  *      `numHashes` signature minima AND the distinct shingle set in a
  *      single shuffle with map-side partial aggregation. Seed j's hash
  *      is the universal family (a_j·h + b_j) mod P over the base hash
  *      — md5 count is |tokens|, independent of numHashes. a_j, b_j are
  *      md5-derived at PLAN time; any engine reproduces them.
  *   3. band keys: base-31 combine of `rows` signature columns — plain
  *      attribute arithmetic, overflow-safe under ANSI for rows ≤ 6.
  *   4. candidate pairs: self-equi-join on (band, key).
  *   5. verify: exact Jaccard over the hashed shingle sets.
  *
  * Scale posture: one shuffle keyed by doc id for the signature agg
  * (reduced map-side), then equi-joins on compact keys (longs / doc
  * ids) — raw text never crosses a shuffle. Candidate volume follows
  * the (bands, rows) S-curve P = 1-(1-j^rows)^bands. Band keys are
  * uniform, so no systematic bucket skew — EXCEPT genuinely viral
  * duplicates (10^4+ copies of one boilerplate text put 10^4 docs in
  * one bucket → O(10^8) pairs from a single key). `maxBucketSize`
  * drops such buckets before the pair join: a bucket that fat is not
  * "near"-duplication but mass EXACT duplication, which the exact-hash
  * dedup pass (q49) removes upstream for a count instead of a
  * quadratic pair list. Dropped buckets are observable via
  * [[bucketStats]]; the DuckDB oracle mirrors the cap.
  *
  * Determinism: md5 + integer arithmetic only — reproducible in any
  * engine (the DuckDB oracle twin mirrors every step). Hash domain is
  * 2^28, so hashed-shingle Jaccard differs from string Jaccard only on
  * collisions (~|shingles|²/2^28 per doc pair — negligible, and both
  * engines collide identically).
  */
object MinHashLSH {

  /** Modulus of the universal hash family: prime < 2^30, so
    * a·h + b < 2^60 — no ANSI overflow. */
  val Mod = 999999937L

  /** First 7 md5 hex digits of "tag:j" as a long in [1, 2^28) — the
    * plan-time constant generator (the oracle renders the same values
    * as literals; never computed at runtime). */
  def planConstant(tag: String, j: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$tag:$j".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString.take(7)
    math.max(1L, java.lang.Long.parseLong(hex, 16))
  }

  def aConst(n: Int): IndexedSeq[Long] = (0 until n).map(planConstant("a", _))
  def bConst(n: Int): IndexedSeq[Long] = (0 until n).map(planConstant("b", _))

  /** 28-bit md5-derived hash of each whitespace token. */
  def tokenHashes(text: Column): Column =
    transform(split(text, " "), t =>
      conv(substring(md5(t), 1, 7), 16, 10).cast(LongType))

  /** Hashed k-shingles from a precomputed token-hash array: base-31
    * polynomial of k consecutive token hashes, mod P. arrays_zip aligns
    * the k shifted views so nothing is re-evaluated per element; docs
    * with fewer than k tokens yield an empty array (slice length 0). */
  def shinglesFromHashes(hts: Column, k: Int = 3): Column = {
    val len = greatest(size(hts) - (k - 1), lit(0))
    val zipped = arrays_zip((0 until k).map(o => slice(hts, lit(o + 1), len)): _*)
    transform(zipped, s =>
      (0 until k).map(o => s.getField(o.toString))
        .reduceLeft((acc, x) => acc * 31 + x) % Mod)
  }

  /** Hashed k-shingles straight from text (md5 per token). */
  def shingleHashArr(text: Column, k: Int = 3): Column =
    shinglesFromHashes(tokenHashes(text), k)

  /** Per-doc signature + shingle set in ONE aggregation:
    * (idCol, sh: array<long>, sig0..sig{n-1}: long). */
  def docSignatures(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, numHashes: Int = 12): DataFrame = {
    val exploded = docs.select(
      col(idCol), explode(shingleHashArr(col(textCol), k)).as("__shash"))
    val aggs =
      collect_set(col("__shash")).as("sh") +:
        (0 until numHashes).map(j =>
          min((lit(aConst(numHashes)(j)) * col("__shash") +
            lit(bConst(numHashes)(j))) % Mod).as(s"sig$j"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** (idCol, __sh_arr) frame — ONE md5 pass per token; the midpoint
    * both the signature agg and the verify-side sets derive from.
    * Persist (or checkpoint, at cluster scale) before fanning out. */
  def shingled(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame =
    docs.select(col(idCol), shingleHashArr(col(textCol), k).as("__sh_arr"))

  /** Signatures from a shingled frame — the shuffle carries numHashes
    * longs per doc, never the shingle sets (those join only the rare
    * candidate pairs). */
  def signaturesFromShingled(sh: DataFrame, idCol: String,
                             numHashes: Int = 12): DataFrame = {
    val exploded = sh.select(col(idCol), explode(col("__sh_arr")).as("__shash"))
    val aggs = (0 until numHashes).map(j =>
      min((lit(aConst(numHashes)(j)) * col("__shash") +
        lit(bConst(numHashes)(j))) % Mod).as(s"sig$j"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, numHashes: Int = 12): DataFrame =
    signaturesFromShingled(shingled(docs, idCol, textCol, k), idCol, numHashes)

  /** Per-row distinct hashed shingle set — a pure projection (NO
    * shuffle); values identical to docSignatures' collect_set. */
  def shingleSetsFromShingled(sh: DataFrame, idCol: String): DataFrame =
    sh.select(col(idCol), array_distinct(col("__sh_arr")).as("sh"))

  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame =
    shingleSetsFromShingled(shingled(docs, idCol, textCol, k), idCol)

  /** Band keys from signature columns: key_b = base-31 polynomial of
    * sig[b·rows .. b·rows+rows-1]. */
  private def bandKeyArr(bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      (0 until rows).map(r => col(s"sig${b * rows + r}"))
        .reduceLeft((acc, x) => acc * 31 + x)): _*)

  /** Buckets holding more docs than this are dropped from candidate
    * generation (and mirrored in the oracle SQL). Far above any honest
    * near-dup cluster; hit only by mass-duplicated boilerplate. */
  val DefaultMaxBucket = 1000

  /** Candidate pairs (aId < bId) whose signatures collide in >=1 band.
    * Input must have columns (idCol: long, textCol: string). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, numHashes: Int = 12,
                     bands: Int = 4, rows: Int = 3,
                     maxBucketSize: Int = DefaultMaxBucket): DataFrame =
    candidatesFrom(docSignatures(docs, idCol, textCol, k, numHashes),
      idCol, bands, rows, maxBucketSize)

  private def candidatesFrom(sigs: DataFrame, idCol: String,
                             bands: Int, rows: Int,
                             maxBucketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = sigs.select(col(idCol),
      posexplode(bandKeyArr(bands, rows)).as(Seq("band", "key")))
    // Viral-bucket cap: one windowed count over (band, key) — the fat
    // bucket lands on one reducer but only as maxBucketSize+ COUNTED
    // rows, never as O(n²) joined pairs. Persisted because the pruned
    // frame feeds both sides of the self-join.
    val pruned = ex
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("__n") <= maxBucketSize).drop("__n")
      .persist()
    pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
  }

  /** PER-ROW banded signature — array of `bands` band keys as one
    * column expression, for contexts where the explode+groupBy
    * signature rollup ([[docSignatures]]) is unavailable or unwanted:
    * STREAMING projections (a stateless map before stateful banding —
    * [[graft.streaming.StreamingNearDup]]) and one-pass per-row use.
    *
    * Everything happens inside ONE `aggregate` fold over the hashed
    * shingle array: the accumulator carries all `numHashes` running
    * minima, and the FINISH lambda combines them into the band keys.
    * That structure is what makes it safe: the shingle array is
    * referenced exactly once (CollapseProject cannot re-inline the md5
    * chain per seed — the ~16× trap in this file's scaladoc), and the
    * 12 sig references in the band-key polynomial hit the fold's
    * accumulator variable, not a recomputed expression. Values are
    * IDENTICAL to docSignatures + bandKeyArr (same aConst/bConst/Mod
    * arithmetic; min over the same multiset — equality is pinned in
    * DedupSpec). Docs with fewer than k tokens yield an EMPTY array
    * (no shingle ⇒ no bands), matching docSignatures' no-rows
    * behavior — callers posexplode, so such docs simply vanish. */
  def bandedSignatureArr(text: Column, k: Int = 3, numHashes: Int = 12,
                         bands: Int = 4, rows: Int = 3): Column = {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    val aArr = array(aConst(numHashes).map(lit): _*)
    val bArr = array(bConst(numHashes).map(lit): _*)
    val seed = array(Seq.fill(numHashes)(lit(Mod)): _*)
    val keys = aggregate(
      shingleHashArr(text, k),
      seed,
      (acc, h) =>
        transform(sequence(lit(0), lit(numHashes - 1)), j =>
          least(element_at(acc, j + 1),
            (element_at(aArr, j + 1) * h + element_at(bArr, j + 1)) % Mod)),
      acc =>
        array((0 until bands).map(b =>
          (0 until rows).map(r => element_at(acc, lit(b * rows + r + 1)))
            .reduceLeft((x, y) => x * 31 + y)): _*))
    // tokens < k ⇒ zero shingles ⇒ the fold never ran and every "min"
    // is still the Mod sentinel — emit no bands at all (cheap gate on
    // the token count, NOT on the md5 chain)
    when(size(split(text, " ")) >= k, keys).otherwise(array())
  }

  /** Observability for the cap: one row per (band, key) bucket with its
    * doc count and whether the pair join skipped it. A pipeline alarms
    * on `sum(dropped)` — dropped buckets mean mass duplication that the
    * exact-dedup pass should have absorbed. */
  def bucketStats(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, numHashes: Int = 12,
                  bands: Int = 4, rows: Int = 3,
                  maxBucketSize: Int = DefaultMaxBucket): DataFrame =
    signatures(docs, idCol, textCol, k, numHashes)
      .select(col(idCol), posexplode(bandKeyArr(bands, rows)).as(Seq("band", "key")))
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n_docs"))
      .withColumn("dropped", col("n_docs") > maxBucketSize)

  /** Full pipeline: candidates verified by exact Jaccard over the
    * hashed shingle sets. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double, k: Int = 3, numHashes: Int = 12,
                   bands: Int = 4, rows: Int = 3,
                   maxBucketSize: Int = DefaultMaxBucket): DataFrame = {
    // One md5 pass per token into a persisted shingle-array midpoint
    // (~8 bytes/token, far smaller than the text; checkpoint instead of
    // caching at cluster scale). Caller/session owns the cache lifetime
    // — Verify and Bench clear the cache between queries. sigs is also
    // persisted: the band self-join consumes it from two sides.
    val sh = shingled(docs, idCol, textCol, k).persist()
    val sigs = signaturesFromShingled(sh, idCol, numHashes).persist()
    val sets = shingleSetsFromShingled(sh, idCol)
    candidatesFrom(sigs, idCol, bands, rows, maxBucketSize)
      .join(sets.select(col(idCol).as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** CROSS-TABLE near-dup join (N19 — the benchmark-decontamination
    * shape): which corpus documents nearly duplicate any probe document
    * (eval-set contamination, licensed-text screening, canary lookup).
    *
    * Same signature math as [[nearDupPairs]], but the band join runs
    * corpus-bands ⋈ probe-bands — corpus×corpus candidates are never
    * GENERATED, rather than generated and filtered, which is the whole
    * game when the corpus is 10⁹ docs and the probe set is 10⁵: the
    * self-join's candidate volume would dwarf the real work. The viral-
    * bucket cap applies to the CORPUS side only (boilerplate lives
    * there); probe sets are curated and assumed cap-free. At cluster
    * scale, broadcast the probe band frame — it is (id, band, key)
    * rows, tiny regardless of probe text size. */
  def crossNearDup(corpus: DataFrame, corpusId: String,
                   probes: DataFrame, probeId: String, textCol: String,
                   minJaccard: Double, k: Int = 3, numHashes: Int = 12,
                   bands: Int = 4, rows: Int = 3,
                   maxBucketSize: Int = DefaultMaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cSh = shingled(corpus, corpusId, textCol, k).persist()
    val pSh = shingled(probes, probeId, textCol, k).persist()
    def bandsOf(sigs: DataFrame, id: String) = sigs.select(col(id),
      posexplode(bandKeyArr(bands, rows)).as(Seq("band", "key")))
    // rename ids before the band join — corpus and probe tables often
    // share the id column name, which would make the selects ambiguous
    val cBands = bandsOf(signaturesFromShingled(cSh, corpusId, numHashes), corpusId)
      .withColumnRenamed(corpusId, "c_id")
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("__n") <= maxBucketSize).drop("__n")
    val pBands = bandsOf(signaturesFromShingled(pSh, probeId, numHashes), probeId)
      .withColumnRenamed(probeId, "p_id")
    val cand = cBands.join(pBands, Seq("band", "key"))
      .select(col("c_id"), col("p_id")).distinct()
    val cSets = shingleSetsFromShingled(cSh, corpusId)
    val pSets = shingleSetsFromShingled(pSh, probeId)
    cand
      .join(cSets.select(col(corpusId).as("c_id"), col("sh").as("sh_c")), "c_id")
      .join(pSets.select(col(probeId).as("p_id"), col("sh").as("sh_p")), "p_id")
      .withColumn("inter", size(array_intersect(col("sh_c"), col("sh_p"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_c")) + size(col("sh_p")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("c_id"), col("p_id"), col("jaccard"))
  }
}
