package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Johnson–Lindenstrauss random projection (SURVEY.md
  * §2.11a N39) — Achlioptas, "Database-friendly random projections"
  * (JCSS 2003): a ±1 projection matrix preserves pairwise squared
  * distances in expectation (E‖P z‖² = dOut·‖z‖²), so a 64-dim
  * embedding sketches to 16 BIGINTs before the expensive downstream
  * passes — sign-LSH bucketing (q57/T15), clustering, dedup — at a
  * quarter of the bytes and dot-product flops.
  *
  * Determinism: the matrix entries are md5-derived (parity of the
  * first hex digit of `rp:<j>:<i>` — the MinHashLSH a/b-constant
  * device), computed ONCE in plain Scala and inlined as literals into
  * both the Spark expression tree and the DuckDB oracle SQL; the
  * projection itself runs on the corpus-global integer grid
  * ([[KMeansInt.quantize]]), so every output coordinate is an exact
  * BIGINT sum, bit-identical on any engine or partitioning. (The grid
  * shift adds a CONSTANT Σᵢ sᵢⱼ·10⁴ per output dim — distances between
  * projected vectors are unaffected, the JL use case.)
  *
  * Scale shape: a pure per-row projection — zero shuffles, zero
  * joins, no state; the 16×64 sign matrix is a plan literal (no
  * broadcast needed). The sketch column then feeds whatever keyed
  * operator follows at 4× less width.
  */
object RandomProjection {

  /** ±1 sign matrix [dOut][dIn], md5-derived — engine-independent
    * constants, reproducible anywhere. */
  def signs(dOut: Int, dIn: Int): Array[Array[Int]] =
    Array.tabulate(dOut, dIn) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 0) 1 else -1
    }

  /** Projected vector (array<long>, length dOut) of a quantized
    * array<long> column. */
  def project(xq: Column, dOut: Int, dIn: Int): Column = {
    val s = signs(dOut, dIn)
    array((0 until dOut).map { j =>
      aggregate(
        zip_with(xq, array(s(j).map(v => lit(v.toLong)): _*), _ * _),
        lit(0L), _ + _)
    }: _*)
  }

  /** The sign matrix as a DuckDB nested-list literal `[[...],...]`,
    * indexable `sgn[j][i]` (1-based). */
  def signsSql(dOut: Int, dIn: Int): String =
    signs(dOut, dIn).map(_.mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
}
