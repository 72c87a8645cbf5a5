package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD '03 — the MOSS algorithm): k-gram rolling hashes reduced to
  * a sparse, position-robust fingerprint set by keeping the MINIMUM
  * hash of every w-wide sliding window of consecutive k-gram hashes.
  *
  * Guarantee (the paper's correctness theorem): any shared token run
  * of length >= w + k - 1 between two documents yields at least one
  * shared fingerprint; no run shorter than k is ever detected.
  * Expected density is 2/(w+1) of the k-gram count, independent of
  * document length.
  *
  * Family position: q63's whole-document rolling hash is ONE value
  * (any edit changes it — exact-dup only); MinHash (q54) is set
  * similarity (order-blind, global); winnowing detects LOCAL overlap —
  * quoted passages, boilerplate spans, eval-set contamination — the
  * remaining member of the fingerprinting family the reference's dedup
  * surface motivates (SURVEY.md §2.10).
  *
  * Scale posture: pure per-row HOF column math — zero shuffles, zero
  * UDFs, one corpus scan; only (doc_id, fingerprints) leaves the scan
  * stage. The shifted-slice/arrays_zip formulation keeps every
  * subexpression evaluated once per ROW (a nested-HOF window-min looks
  * natural but inlines the gram array into every lambda element — the
  * same O(n²) trap [[MinHashLSH]]'s scaladoc documents). Hashing
  * reuses MinHashLSH's engine-agnostic md5/base-31 scheme, so a DuckDB
  * twin reproduces every fingerprint bit-exactly.
  */
object Winnowing {

  /** Distinct winnowed fingerprints of `text` (space-separated tokens;
    * k-gram base-31 hashes mod [[MinHashLSH.Mod]]; window-w minima).
    * Fewer than k + w - 1 tokens yields an empty array — the guarantee
    * window cannot fit. */
  def fingerprints(text: Column, k: Int = 4, w: Int = 4): Column =
    array_distinct(windowMinima(
      MinHashLSH.shinglesFromHashes(MinHashLSH.tokenHashes(text), k), w))

  /** Minimum of each w-wide sliding window over `grams`: arrays_zip of
    * w shifted views + a per-struct `least` — no lambda ever references
    * the gram array itself, so codegen CSE computes it once per row. */
  def windowMinima(grams: Column, w: Int): Column = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val len = greatest(size(grams) - (w - 1), lit(0))
    val zipped = arrays_zip((0 until w).map(o => slice(grams, lit(o + 1), len)): _*)
    transform(zipped, s =>
      (0 until w).map(o => s.getField(o.toString)).reduceLeft(least(_, _)))
  }

  /** The RELATIONAL form — distinct (idCol, "f") fingerprint rows —
    * and the one the registered queries use. The [[fingerprints]]
    * column form is semantically identical (equality pinned in
    * WinnowingSpec) but nested HOF lambdas are interpreted, not
    * codegen'd, and get no common-subexpression elimination: the
    * gram→hash chain re-evaluates per shifted-slice reference, ~16×
    * the md5 work (measured 13 s vs 2 s on 6k docs at sf0.1 — the
    * same trap [[MinHashLSH]]'s scaladoc records for signatures).
    * Here grams explode ONCE and the sliding-window minimum is a
    * frame aggregate over (doc, gram position) — one shuffle on the
    * doc id, the same price MinHash pays for its signature rollup,
    * and the fingerprint column arrives already exploded, which is
    * what the pair join (q107) wants anyway. */
  def fingerprintRows(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 4, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = MinHashLSH.shingleHashArr(col(textCol), k)
    val exploded = docs.select(col(idCol), posexplode(grams).as(Seq("pos", "g")))
    val part = Window.partitionBy(col(idCol))
    val frame = part.orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    exploded
      .withColumn("ng", count(lit(1)).over(part))
      .withColumn("f", min(col("g")).over(frame))
      .filter(col("pos") <= col("ng") - w) // only full w-wide windows
      .select(col(idCol), col("f"))
      .distinct()
  }
}
