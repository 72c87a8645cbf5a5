package graft.operators

import graft.SparkSpecBase
import graft.multimodal.{Phash, RealCodecs}
import graft.multimodal.RealCodecs.{BmpCodec, ImageIoCodec, PngCodec}
import org.apache.spark.sql.functions.{expr, posexplode}

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

  test("collapsed() expansion-equivalence: expanding (repPairs, members) " +
    "through the member map reproduces join() exactly, and repPairs stays " +
    "representative-sized on viral duplicate groups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val base = (0 until 50).map(_ => rnd.nextLong() & ((1L << 56) - 1))
    // one viral group: signature base(0) carried by 40 ids
    val hs = base ++ Seq.fill(40)(base(0)) ++
      base.take(8).map(h => h ^ (1L << rnd.nextInt(56)))
    val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = rows.toDF("id", "h")
    val (rp, mm) = HammingJoin.collapsed(df, "id", "h", k = 2, bits = 56)
    val reps = mm.collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    // manual expansion: cross pairs through the member map + within-rep
    // pairs at dist 0
    val rpRows = rp.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byRep = reps.groupBy(_._2).map { case (rep, m) => rep -> m.keys.toSeq }
    val cross = rpRows.flatMap { case (ra, rb, d) =>
      for { a <- byRep(ra); b <- byRep(rb) }
        yield (math.min(a, b), math.max(a, b), d)
    }
    val within = byRep.values.flatMap { ids =>
      for { a <- ids; b <- ids if a < b } yield (a, b, 0)
    }
    assert((cross ++ within).toSet === run(rows, k = 2, bits = 56))
    // the viral group (41 members) is ONE members-side rep and
    // contributes zero repPairs rows by itself
    assert(rpRows.forall { case (a, b, d) => a < b && d >= 1 && d <= 2 })
    // every rep named in repPairs is a real representative, and the
    // 41-member viral group maps to exactly one of them
    val repSet = byRep.keySet
    assert(rpRows.forall { case (a, b, _) => repSet(a) && repSet(b) })
    assert(byRep.values.count(_.size >= 41) === 1)
  }

  test("bandValuesExpr probe-consistency: equi-joining per-row band " +
    "arrays + popcount verify reproduces join() exactly (the T24 " +
    "frozen-index probe is the same math as the batch join)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0 until 60).map(_ => rnd.nextLong() & ((1L << 56) - 1))
    val hs = base ++ base.take(12).map(h => h ^ (1L << rnd.nextInt(56)) ^
      (1L << rnd.nextInt(56))) ++ base.take(5)
    val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = rows.toDF("id", "h")
      .withColumn("bands", HammingJoin.bandValuesExpr("h", 2, 56))
      .select($"id", $"h", posexplode($"bands").as(Seq("band", "bval")))
    val a = df.select($"band", $"bval", $"id".as("a_id"), $"h".as("ha"))
    val b = df.select($"band", $"bval", $"id".as("b_id"), $"h".as("hb"))
    val probed = a.join(b, Seq("band", "bval"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("dist"))
      .filter($"dist" <= 2)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probed === run(rows, k = 2, bits = 56))
    assert(probed === brute(rows, 2))
  }

  test("signatures are masked to the declared low `bits` bits: garbage " +
    "above the width cannot change pairs or distances (r11 ADVICE)") {
    val rnd = new scala.util.Random(5)
    val clean = (0 until 40).map(i =>
      (i.toLong, rnd.nextLong() & ((1L << 16) - 1)))
    // same low 16 bits, random garbage above
    val dirty = clean.map { case (i, h) => (i, h | (rnd.nextLong() << 16)) }
    Seq(0, 2).foreach { k =>
      assert(run(dirty, k, bits = 16) === run(clean, k, bits = 16),
        s"k=$k: high bits leaked into the k-neighbor result")
      assert(run(clean, k, bits = 16) === brute(clean, k))
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
