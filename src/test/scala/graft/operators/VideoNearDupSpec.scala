package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the r13 single-equi-join VideoNearDup (collapsed reps + one
  * (f, band, bval) self-join) against the brute-force definition the
  * old per-frame-index loop implemented: same n_s, same frame-index
  * set, EVERY corresponding frame pair within hamming k on the masked
  * hashes. */
class VideoNearDupSpec extends SparkSpecBase {

  private val k = 2
  private val bits = 56
  private val mask = (1L << bits) - 1

  /** Deterministic pseudo-random corpus: base clips + exact copies +
    * per-frame-perturbed near-dups + an intro-card-only overlap clip +
    * a different-length clip. */
  private def corpus(): Seq[(Long, Int, Long, Long)] = {
    val rnd = new scala.util.Random(4213)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long)]()
    val intro = rnd.nextLong() & mask
    var id = 0L
    def add(frames: Seq[Long]): Long = {
      val cid = id; id += 1
      frames.zipWithIndex.foreach { case (h, f) =>
        rows += ((cid, f, h, frames.size.toLong))
      }
      cid
    }
    (0 until 8).foreach { _ =>
      val nF = 3 + rnd.nextInt(3)
      val base = Seq.fill(nF)(rnd.nextLong() & mask)
      add(intro +: base.tail)                      // shares frame 0 only
      add(base)                                    // the original
      add(base)                                    // exact copy (viral group)
      // near-dup: flip <= k bits in every frame
      add(base.map { h =>
        (0 until 1 + rnd.nextInt(k)).foldLeft(h)((a, _) =>
          a ^ (1L << rnd.nextInt(bits)))
      })
      // far: flip many bits in one frame -> must NOT pair with base
      add(base.updated(0, base.head ^ ((1L << (k + 3)) - 1)))
      add(base :+ (rnd.nextLong() & mask))         // longer clip
    }
    rows.toSeq
  }

  private def bruteForce(rows: Seq[(Long, Int, Long, Long)]): Set[(Long, Long)] = {
    val byClip = rows.groupBy(_._1).map { case (c, rs) =>
      c -> rs.map(r => r._2 -> (r._3 & mask)).toMap
    }
    val ids = byClip.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = byClip(ids(i)); b = byClip(ids(j))
      if a.keySet == b.keySet &&
        a.forall { case (f, h) => java.lang.Long.bitCount(h ^ b(f)) <= k }
    } yield (ids(i), ids(j))).toSet
  }

  test("single-join clipPairs == brute-force temporal agreement " +
    "(old per-frame-loop semantics) on a mixed corpus with exact copies, " +
    "near-dups, intro-card overlaps, far clips, and length mismatches") {
    val s = spark
    import s.implicits._
    val rows = corpus()
    val df = rows.toDF("clip_id", "f", "dhash", "n_s")
    val got = VideoNearDup.clipPairs(df, k, bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(rows)
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "degenerate corpus: no pairs to check")
  }

  test("clusterClips == union-find over brute-force pairs, and components " +
    "are min-clip-id labeled (rep-level labelStar is exact)") {
    val s = spark
    import s.implicits._
    val rows = corpus()
    val df = rows.toDF("clip_id", "f", "dhash", "n_s")
    val got = VideoNearDup.clusterClips(df, k, bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find reference
    val ids = rows.map(_._1).distinct.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    bruteForce(rows).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).toMap
    assert(got === want)
  }

  test("collapsed() stays representative-sized on a viral group: 50 " +
    "identical clips + 1 near-dup = 1 rep pair, 51 members; expansion " +
    "through the member map reproduces clipPairs") {
    val s = spark
    import s.implicits._
    val base = Seq(0x123456789abL, 0x55aa55aa55L, 0x0f0f0f0f0fL)
    val viral = (0L until 50L).flatMap { c =>
      base.zipWithIndex.map { case (h, f) => (c, f, h, base.size.toLong) }
    }
    val near = base.zipWithIndex.map { case (h, f) =>
      (99L, f, h ^ 1L, base.size.toLong)
    }
    val df = (viral ++ near).toDF("clip_id", "f", "dhash", "n_s")
    val (rp, members) = VideoNearDup.collapsed(df, k, bits)
    val rpRows = rp.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rpRows.toSeq === Seq((0L, 99L)),
      s"rep pairs should be representative-sized, got ${rpRows.toSeq}")
    assert(members.count() === 51L)
    // expanded pair count: C(50,2) within + 50 cross = 1225 + 50
    assert(VideoNearDup.clipPairs(df, k, bits).count() === 1275L)
  }

  test("mask contract: bits above the declared width change nothing " +
    "(signature identity, banding, verify all masked)") {
    val s = spark
    import s.implicits._
    val h = 0x5a5a5aL
    val in = Seq(
      (1L, 0, h | (1L << 60), 1L),   // stray high bit
      (2L, 0, h | (1L << 58), 1L),   // different stray bit -> same masked
      (3L, 0, (~h) & mask, 1L))
    val df = in.toDF("clip_id", "f", "dhash", "n_s")
    val got = VideoNearDup.clusterClips(df, k, bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("LongType frame index is accepted (r12 ADVICE: no " +
    "ClassCastException on integral f)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L, 7L, 2L), (1L, 1L, 9L, 2L),
      (2L, 0L, 7L, 2L), (2L, 1L, 9L, 2L))
      .toDF("clip_id", "f", "dhash", "n_s")
    val got = VideoNearDup.clipPairs(df, k, bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}
