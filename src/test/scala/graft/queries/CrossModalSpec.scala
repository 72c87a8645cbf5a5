package graft.queries

import graft.SparkSpecBase

/** q261 cross-modality retrieval pins (MM12): the deterministic joint
  * embedding's geometry — a text query's own image is its brute-force
  * nearest neighbour (the encoders agree up to quantization noise), and
  * the staggered-grid banded path finds the brute-force winner (recall
  * floor). The grid guarantee is also pinned as pure arithmetic: two
  * width-32 grids offset by 16 put any two values within 16 of each
  * other in at least one shared cell.
  */
class CrossModalSpec extends SparkSpecBase {

  test("q261 on testdata: every text query retrieves its OWN image " +
    "brute-force (joint-space geometry) and the banded path matches " +
    "brute force (recall 1.0 here; the pinned floor)") {
    val out = Multimodal.q261.build(spark, sf).collect()
    assert(out.nonEmpty)
    val self = out.map(_.getAs[Long]("self_hit"))
    val hit = out.map(_.getAs[Long]("band_hit"))
    assert(self.sum === self.length.toLong,
      s"${self.length - self.sum} queries did not retrieve their own image")
    assert(hit.sum === hit.length.toLong,
      s"banded recall ${hit.sum}/${hit.length} below the pinned floor")
    // own-image distance is quantization noise: <= 16 dims * 9
    val d = out.map(_.getAs[Long]("bf1_d"))
    assert(d.max <= 16L * 9, s"own-image distance ${d.max} beyond the law")
  }

  test("q262 on testdata: every text query's top-2 over the UNIFIED " +
    "image+audio index is exactly {own image, own audio}, and the " +
    "audio latent inverts the ADPCM staircase within its noise bound") {
    val out = Multimodal.q262.build(spark, sf).collect()
    assert(out.nonEmpty)
    val own = out.map(_.getAs[Long]("both_own"))
    assert(own.sum === own.length.toLong,
      s"${own.length - own.sum} queries missed an own-modality item")
    // image (t1) is the tighter modality; audio noise stays well under
    // the 16*99 segment-inversion bound
    out.foreach { r =>
      assert(r.getAs[Long]("t1_d") <= 16L * 9)
      assert(r.getAs[Long]("t2_d") < 16L * 99)
    }
  }

  test("staggered-grid candidate guarantee: any two dim-0 values within " +
    "16 share a cell in at least one of the two offset grids") {
    for (a <- 0 to 255; delta <- -16 to 16) {
      val b = a + delta
      if (b >= 0 && b <= 255) {
        val share = (a / 32 == b / 32) || ((a + 16) / 32 == (b + 16) / 32)
        assert(share, s"values $a and $b (|delta| <= 16) share no cell")
      }
    }
  }
}
