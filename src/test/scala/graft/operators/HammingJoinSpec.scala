package graft.operators

import graft.SparkSpecBase
import graft.multimodal.{Phash, RealCodecs}
import graft.multimodal.RealCodecs.{BmpCodec, ImageIoCodec, PngCodec}

/** HammingJoin (MM2/q217's pair step) + Phash: the banded join must be
  * BIT-IDENTICAL to the all-pairs hamming definition, and the hashes
  * must behave as the dedup design assumes (dHash locality, container
  * independence).
  */
class HammingJoinSpec extends SparkSpecBase {

  private def brute(rows: Seq[(Long, Long)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= k
    } yield (ia, ib, d)).toSet

  private def run(rows: Seq[(Long, Long)], k: Int, bits: Int): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    HammingJoin.join(rows.toDF("id", "h"), "id", "h", k, bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def seedOf(n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"img-$n".getBytes("UTF-8"))
  }

  private def comps(seed: Array[Byte], hot: Int = -1): Array[Int] =
    Array.tabulate(189) { i =>
      if (hot >= 0 && i / 3 == hot) seed((i + 7) % 16) & 0xff
      else seed(i % 16) & 0xff
    }

  private def decodePng(c: Array[Int]): RealCodecs.Img =
    ImageIoCodec.decode(PngCodec.synthesizeComps(c, 9, 7)).get

  test("banded join == brute force on REAL seeded perturbed images " +
    "(decode -> dHash -> HammingJoin, k=2)") {
    // 60 base images, each with a one-pixel-perturbed variant (the q217
    // construction): true near-pairs exist by construction, and seeds
    // 0/1 share text-collision-free hashes
    val rows = (0 until 60).flatMap { n =>
      val seed = seedOf(n)
      Seq(
        (n * 2L, Phash.dHash(decodePng(comps(seed)))),
        (n * 2L + 1, Phash.dHash(decodePng(comps(seed, hot = n % 63)))))
    }
    assert(run(rows, k = 2, bits = 56) === brute(rows, 2))
    // every planted original<->variant pair is found
    (0 until 60).foreach { n =>
      assert(brute(rows, 2).exists { case (a, b, _) =>
        a == n * 2L && b == n * 2L + 1 },
        s"planted pair $n missing from the truth itself")
    }
  }

  test("one-pixel perturbation flips at most 2 dHash bits (the locality " +
    "law the k=2 join relies on); aHash has no such bound by design") {
    (0 until 200).foreach { n =>
      val seed = seedOf(n)
      val orig = Phash.dHash(decodePng(comps(seed)))
      val pert = Phash.dHash(decodePng(comps(seed, hot = n % 63)))
      val d = java.lang.Long.bitCount(orig ^ pert)
      assert(d <= 2, s"seed $n: one-pixel edit moved dHash by $d bits")
    }
  }

  test("container independence: the same component plane through PNG and " +
    "BMP decodes to identical pixels and identical hashes") {
    (0 until 20).foreach { n =>
      val c = comps(seedOf(n))
      val png = decodePng(c)
      val bmp = ImageIoCodec.decode(BmpCodec.synthesizeComps(c, 9, 7)).get
      assert(png.comps.toSeq === bmp.comps.toSeq)
      assert(Phash.dHash(png) === Phash.dHash(bmp))
      assert(Phash.aHash(png) === Phash.aHash(bmp))
    }
  }

  test("banded join == brute force on random signatures with duplicates, " +
    "k = 0, 1, 3 (exact-group-first expands dist-0 pairs unverified)") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 80).map(_ => rnd.nextLong() & ((1L << 56) - 1))
    // plant duplicates (viral groups) and 1-bit neighbors
    val hs = base ++ base.take(10) ++ base.take(4) ++
      base.take(15).map(h => h ^ (1L << rnd.nextInt(56)))
    val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    Seq(0, 1, 3).foreach { k =>
      assert(run(rows, k, bits = 56) === brute(rows, k), s"k=$k diverged")
    }
  }

  test("aHash matches its definition (strict mean-sign, cross-multiplied)") {
    val img = decodePng(comps(seedOf(7)))
    val l = Phash.luma(img)
    val tot = l.sum
    val expect = l.indices.foldLeft(0L) { (h, p) =>
      if (l(p) * l.length > tot) h | (1L << p) else h
    }
    assert(Phash.aHash(img) === expect)
  }
}
