package graft.multimodal

import graft.SparkSpecBase
import graft.multimodal.RealCodecs.{FlacCodec, WavCodec}
import org.apache.spark.sql.functions._

/** Pins the q232 audio fingerprint's two load-bearing laws (gain
  * invariance, single-frame-edit locality), codec independence, and
  * the end-to-end clustering against brute force. */
class AudioFingerprintSpec extends SparkSpecBase {

  private val frameLen = 8
  private val nBits = 56
  private val n = (nBits + 1) * frameLen
  private val rnd = new scala.util.Random(1741)

  private def randomPcm(): Array[Int] =
    Array.fill(n)(rnd.nextInt(4001) - 2000)

  test("gain invariance: a level-shifted copy (positive integer gain) " +
    "has the IDENTICAL signature — distance 0 by construction") {
    (0 until 20).foreach { _ =>
      val x = Array.fill(n)(rnd.nextInt(801) - 400) // gain 16 stays 16-bit
      val g = 1 + rnd.nextInt(16)
      assert(AudioFingerprint.energySign(x, frameLen) ===
        AudioFingerprint.energySign(x.map(_ * g), frameLen))
    }
  }

  test("locality: editing samples inside ONE frame flips at most 2 " +
    "signature bits (the k=2 HammingJoin bound is lossless for " +
    "single-frame edits)") {
    (0 until 50).foreach { _ =>
      val x = randomPcm()
      val sig = AudioFingerprint.energySign(x, frameLen)
      val hot = rnd.nextInt(nBits + 1)
      val y = x.clone()
      (8 * hot until 8 * hot + 8).foreach(i => y(i) = rnd.nextInt(4001) - 2000)
      val d = java.lang.Long.bitCount(
        sig ^ AudioFingerprint.energySign(y, frameLen))
      assert(d <= 2, s"frame $hot edit flipped $d bits")
    }
  }

  test("codec independence: the same PCM through the WAV container and " +
    "the FLAC encoder decodes to identical samples and one signature") {
    (0 until 10).foreach { _ =>
      val x = randomPcm()
      val wav = WavCodec.parse(WavCodec.synthesizeSamples(x)).get
      val flac = FlacCodec.parse(FlacCodec.synthesizeSamples(x)).get
      assert(wav.samples.sameElements(x))
      assert(flac.samples.sameElements(x))
      assert(AudioFingerprint.energySign(wav.samples, frameLen) ===
        AudioFingerprint.energySign(flac.samples, frameLen))
    }
  }

  test("extra tail samples beyond (nBits+1)*frameLen are ignored; too " +
    "few samples fail loudly") {
    val x = randomPcm()
    assert(AudioFingerprint.energySign(x ++ Array.fill(13)(999), frameLen) ===
      AudioFingerprint.energySign(x, frameLen))
    intercept[IllegalArgumentException] {
      AudioFingerprint.energySign(x.take(n - 1), frameLen)
    }
  }

  test("q243 gate cohorts: clean audio passes both gates; the crushed " +
    "cohort straddles the clipping threshold so BOTH verdict branches " +
    "are live; n_clipped is zero exactly on the clean cohort") {
    val rows = graft.queries.Multimodal.q243.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(7)))
    val (clean, crushed) = rows.partition(_._1 % 2 == 0)
    assert(clean.forall(_._3 == 1L), "a clean clip failed a gate")
    assert(clean.forall(_._2 == 0L), "a clean clip reported clipping")
    assert(crushed.exists(_._3 == 0L) && crushed.exists(_._3 == 1L),
      "the crushed cohort no longer straddles the clipping threshold")
  }

  test("q244 bundle AND-semantics: the faithful copy (v=1) collapses " +
    "with its original, the inverted-image variant (v=2) never does " +
    "despite same text and matching audio — one broken modality blocks " +
    "the merge") {
    val rows = graft.queries.Multimodal.q244.build(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = rows.keys.map(_ / 3).toSeq.distinct
    assert(docs.nonEmpty)
    docs.foreach { d =>
      assert(rows(d * 3) === rows(d * 3 + 1),
        s"doc $d: faithful copy did not collapse")
      assert(rows(d * 3 + 2) !== rows(d * 3),
        s"doc $d: the broken-image bundle merged anyway")
    }
  }

  test("end-to-end clustering (q232's collapse) == brute-force hamming " +
    "union-find over the signatures, including viral identical groups") {
    val s = spark
    import s.implicits._
    // 12 base clips, each with: 2 exact copies, 1 single-frame edit,
    // 1 gain-shifted copy
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    (0 until 12).foreach { _ =>
      val x = Array.fill(n)(rnd.nextInt(801) - 400)
      val sig = AudioFingerprint.energySign(x, frameLen)
      rows += ((id, sig)); id += 1
      rows += ((id, sig)); id += 1 // exact copy
      val y = x.clone()
      val hot = rnd.nextInt(nBits + 1)
      (8 * hot until 8 * hot + 8).foreach(i => y(i) = rnd.nextInt(801) - 400)
      rows += ((id, AudioFingerprint.energySign(y, frameLen))); id += 1
      rows += ((id, AudioFingerprint.energySign(x.map(_ * 3), frameLen))); id += 1
    }
    val df = rows.toSeq.toDF("clip_id", "sig")
    val (repPairs, members) = graft.operators.HammingJoin
      .collapsed(df, "clip_id", "sig", k = 2, bits = nBits)
    val repLabeled = graft.operators.ConnectedComponents
      .labelStar(members.select($"rep").distinct(), "rep",
        repPairs, "rep_a", "rep_b")
    val got = members.join(repLabeled, "rep")
      .select($"id", $"component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force union-find at k=2
    val ids = rows.map(_._1).toSeq.sorted
    val sig = rows.toMap
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(q: Long): Long =
      if (parent(q) == q) q else { val r = find(parent(q)); parent(q) = r; r }
    for (i <- ids; j <- ids if i < j
         if java.lang.Long.bitCount(sig(i) ^ sig(j)) <= 2) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    assert(got === ids.map(i => i -> find(i)).toMap)
    // every planted family must actually have collapsed (edit within
    // locality, gain/exact at distance 0)
    (0 until 12).foreach { g =>
      val fam = (4L * g) until (4L * g + 4)
      assert(fam.map(find).toSet.size === 1, s"family $g did not collapse")
    }
  }
}
