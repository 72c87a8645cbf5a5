package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Barriers._

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

  /** Exploded (idCol, "f") fingerprint rows — the form the pair join
    * (q107) and the extraction query (q95) consume.
    *
    * Shape history (the measurements live in BASELINE.md): the naive
    * column form straight off `text` re-evaluates the md5→gram chain
    * per shifted-slice reference (~16× the hash work, 13 s vs 2 s on
    * 6k docs — the CollapseProject/no-lambda-CSE trap [[MinHashLSH]]'s
    * scaladoc records). Round 6 shipped a relational rewrite
    * (posexplode + frame-min window) that computes hashes once but
    * pays a doc-keyed shuffle + per-doc sort for the window AND a
    * second (doc, f) shuffle for the distinct. This form gets both
    * properties at once: materialize the gram ARRAYS one time
    * (localCheckpoint — an optimizer barrier, so the shifted-slice
    * references below read the stored column instead of inlining the
    * md5 chain; eager, blocks freed by the ContextCleaner, never a
    * CacheManager entry), then take the per-ROW sliding minima +
    * array_distinct and explode. ZERO shuffles before the pair join —
    * the window sort and the distinct exchange both vanish (measured
    * 4.6 → 1.9 s min on q107, 3.5 → 1.0 s on q95 at sf0.1).
    *
    * Scale: the checkpoint stores one long array per doc (≈ the token
    * count) — the same bytes the r6 posexplode SHUFFLED, written to
    * executor-local storage instead of the wire, and winnowing stays
    * embarrassingly parallel (per-row math, no co-location needed).
    *
    * Fault-tolerance tradeoff (r8, ADVICE — applies to every
    * localCheckpoint barrier in this library: here, SemDeDup.clustered,
    * the CC/k-means round barriers, the q186/q190 pre-sort): a LOCAL
    * checkpoint truncates lineage without replicating blocks, so on a
    * cluster an executor loss makes its blocks unrecoverable and FAILS
    * the job rather than recomputing — acceptable for interactive and
    * short-batch work (rerun the query), wrong for long multi-hour
    * jobs on preemptible nodes. There, set
    * `spark.graft.reliableCheckpoints=true` plus a durable checkpoint
    * dir and EVERY `.barrier()` in the library becomes a reliable
    * `checkpoint()` (same barrier semantics, blocks in fault-tolerant
    * storage — [[graft.core.Barriers]]); the operators' plan shapes are
    * unchanged; the eager materialization job at build time is
    * inherent to either. */
  def fingerprintRows(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 4, w: Int = 4): DataFrame = {
    val grams = docs
      .select(col(idCol), MinHashLSH.shingleHashArr(col(textCol), k).as("__g"))
      .barrier()
    grams.select(col(idCol),
      explode(array_distinct(windowMinima(col("__g"), w))).as("f"))
  }
}
