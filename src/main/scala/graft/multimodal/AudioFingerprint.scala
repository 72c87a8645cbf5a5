package graft.multimodal

/** Perceptual audio fingerprint: sign-of-energy-delta bit signature
  * over framed PCM (SURVEY.md §2 MM4 / q232; [[Phash.dHash]]'s device
  * applied along time instead of across pixel columns — the
  * chromaprint family's core idea with exact integer math, log-free
  * and FFT-free so the DuckDB oracle can replay it bit-for-bit).
  *
  * The clip's samples are framed into `nBits + 1` consecutive windows
  * of `frameLen` samples; each frame's energy is the EXACT Long sum of
  * squared samples (16-bit PCM × frameLen ≤ 2^34 per frame — no
  * overflow, no floats); bit f is set iff energy(f) < energy(f+1).
  *
  * Robustness properties (AudioFingerprintSpec pins both):
  *  - GAIN invariance: a level-shifted copy (all samples scaled by a
  *    positive factor) scales every energy by the factor squared —
  *    every strict comparison is unchanged, distance 0.
  *  - LOCALITY: editing samples inside ONE frame changes one energy,
  *    which touches exactly the two comparisons that read it — at most
  *    2 signature bits flip, so an edited copy lands within hamming 2
  *    (the same bound q217 proves for one-pixel image edits), and the
  *    k=2 [[graft.operators.HammingJoin]] collapse is lossless for
  *    single-frame edits by construction.
  *
  * Lossless-codec invariance is free: FLAC/WAV decode is bit-exact, so
  * a re-encoded copy has identical samples and an identical signature.
  */
object AudioFingerprint {

  /** `nBits`-bit energy-sign signature; needs exactly
    * `(nBits + 1) * frameLen` leading samples (extra tail ignored —
    * the signature is a fixed-length prefix summary by design, so
    * clips of different lengths remain comparable). */
  def energySign(samples: Array[Int], frameLen: Int, nBits: Int = 56): Long = {
    require(nBits >= 1 && nBits <= 63, s"need 1 <= nBits <= 63 (got $nBits)")
    require(frameLen >= 1, s"need frameLen >= 1 (got $frameLen)")
    require(samples.length >= (nBits + 1) * frameLen,
      s"need >= ${(nBits + 1) * frameLen} samples (got ${samples.length})")
    var sig = 0L
    var prev = frameEnergy(samples, 0, frameLen)
    var f = 0
    while (f < nBits) {
      val next = frameEnergy(samples, (f + 1) * frameLen, frameLen)
      if (prev < next) sig |= 1L << f
      prev = next
      f += 1
    }
    sig
  }

  /** Exact integer frame energy: sum of squared samples as Long. */
  def frameEnergy(samples: Array[Int], from: Int, frameLen: Int): Long = {
    var e = 0L
    var i = from
    val until = from + frameLen
    while (i < until) { val x = samples(i).toLong; e += x * x; i += 1 }
    e
  }
}
