package graft.multimodal

/** Perceptual image hashes — dHash (gradient signs) and aHash (mean
  * signs) over a decoded luma grid (SURVEY.md §2 MM2; the r9 verdict's
  * multimodal-dedup gap: the corpus DECODED images — q188/q189 — but
  * never DEDUPED them).
  *
  * Both hashes are pure integer sign patterns, which is what makes them
  * oracle-able: luma is the integer ITU-R 601 weighting
  * `299·r + 587·g + 114·b` (the usual /1000 dropped — signs are
  * scale-invariant), dHash bit (row r, col x) is the sign of the
  * horizontal gradient `luma(r,x) < luma(r,x+1)`, aHash bit p is
  * `luma(p)·n > Σ luma` (cross-multiplied — no division anywhere). No
  * float, no resampling kernel, no libm: the q189 DuckDB twin can
  * recompute every bit from the synthesis seed arithmetic.
  *
  * Locality is the operational difference (ImagePhashSpec pins both):
  * one changed pixel flips AT MOST 2 dHash bits (it sits in at most two
  * horizontal comparisons), so dHash pairs well with a hamming-banded
  * join at small k ([[graft.operators.HammingJoin]]); one changed pixel
  * can move the aHash MEAN and flip arbitrarily many near-threshold
  * bits, so aHash is reported as a secondary signature, not joined on.
  *
  * Production note: real pipelines resize to the hash grid first
  * (classic dHash is 9×8). The corpus here is already grid-sized
  * (9×7); a resize step would be one more deterministic integer
  * box-filter in the same mapPartitions pass.
  */
object Phash {

  /** Integer luma plane (×1000): `299·r + 587·g + 114·b` per pixel,
    * row-major. */
  def luma(img: RealCodecs.Img): Array[Long] = {
    val n = img.width * img.height
    Array.tabulate(n) { p =>
      299L * img.comps(3 * p) + 587L * img.comps(3 * p + 1) +
        114L * img.comps(3 * p + 2)
    }
  }

  /** dHash: bit `r·(w−1) + x` = 1 iff `luma(r,x) < luma(r,x+1)` —
    * (w−1)·h bits (56 for the 9×7 corpus), horizontal gradient signs. */
  def dHash(img: RealCodecs.Img): Long = {
    require((img.width - 1) * img.height <= 63,
      s"dHash: ${img.width}x${img.height} exceeds 63 bits")
    val l = luma(img)
    var h = 0L
    var b = 0
    var r = 0
    while (r < img.height) {
      var x = 0
      while (x < img.width - 1) {
        if (l(r * img.width + x) < l(r * img.width + x + 1)) h |= 1L << b
        b += 1
        x += 1
      }
      r += 1
    }
    h
  }

  /** aHash: bit p = 1 iff `luma(p)·n > Σ luma` (strict, cross-
    * multiplied) — w·h bits (63 for the 9×7 corpus), mean signs. */
  def aHash(img: RealCodecs.Img): Long = {
    val l = luma(img)
    val n = l.length
    require(n <= 63, s"aHash: $n pixels exceeds 63 bits")
    var tot = 0L
    var i = 0
    while (i < n) { tot += l(i); i += 1 }
    var h = 0L
    var p = 0
    while (p < n) {
      if (l(p) * n > tot) h |= 1L << p
      p += 1
    }
    h
  }
}
