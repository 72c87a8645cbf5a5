package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** TopKScored algebra: the kept set must equal brute-force sort-take-k
  * for any partitioning of the input — reduce/merge order invariance is
  * what makes the aggregate oracle-checkable.
  */
class TopKSpec extends AnyFunSuite {
  import TopKScored.Entry

  // The oracle order is Spark's sort order for score DESC: NaN first,
  // 0.0 before -0.0 — java.lang.Double.compare, NOT a negated sortBy
  // key (negation flips which zero wins and where NaN lands).
  private def brute(xs: Seq[(Double, Long, Long)], k: Int): Seq[Entry] =
    xs.map(t => Entry(t._1, t._2, t._3))
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c < 0 else a.id < b.id
      }.take(k)

  test("reduce-then-merge equals brute force under arbitrary splits") {
    val rnd = new Random(42)
    val xs = Seq.tabulate(500)(i =>
      (rnd.nextInt(50).toDouble / 10.0, i.toLong, (i % 7).toLong))
    val agg = new TopKScored(10)
    for (seed <- 1 to 20) {
      val r = new Random(seed)
      val shuffled = r.shuffle(xs)
      val parts = shuffled.grouped(1 + r.nextInt(100)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === brute(xs, 10),
        s"split seed $seed diverged from brute force")
    }
  }

  test("mixed -0.0/0.0/NaN scores at the k boundary are split-invariant " +
    "and follow the total order (ADVICE r5: one order for reduce AND merge)") {
    val xs = Seq((0.0, 1L, 0L), (-0.0, 2L, 0L), (Double.NaN, 3L, 0L),
      (0.0, 4L, 0L), (-0.0, 5L, 0L), (1.0, 6L, 0L), (-1.0, 7L, 0L))
    val agg = new TopKScored(4)
    val expected = brute(xs, 4)
    // NaN greatest, then 1.0, then the +0.0s by id — the -0.0s fall out
    assert(expected.map(_.id) === Seq(3L, 6L, 1L, 4L))
    for (seed <- 1 to 30) {
      val r = new Random(seed)
      val parts = r.shuffle(xs).grouped(1 + r.nextInt(4)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).map(e => (java.lang.Double.doubleToRawLongBits(e.score), e.id)) ===
        expected.map(e => (java.lang.Double.doubleToRawLongBits(e.score), e.id)),
        s"split seed $seed diverged on the ±0.0/NaN boundary")
    }
  }

  test("ties in score break by smaller id") {
    val agg = new TopKScored(2)
    val xs = Seq((1.0, 5L, 0L), (1.0, 3L, 0L), (1.0, 9L, 0L))
    val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(got.map(_.id) === Seq(3L, 5L))
  }

  test("buffer never exceeds k") {
    val agg = new TopKScored(3)
    val b = (1 to 100).foldLeft(agg.zero)((acc, i) =>
      agg.reduce(acc, (i.toDouble, i.toLong, 0L)))
    assert(b.length === 3)
    assert(b.map(_.id) === Seq(100L, 99L, 98L))
  }

  // ---- TopKStr (the string-identified sibling; q172's de-window) ----

  private def bruteS(xs: Seq[(Long, String, Long)], k: Int): Seq[TopKStr.EntryS] = {
    def cmp(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    xs.map(t => TopKStr.EntryS(t._1, t._2, t._3))
      .sortWith { (a, b) =>
        val c = java.lang.Long.compare(b.score, a.score)
        if (c != 0) c < 0 else cmp(a.id, b.id) < 0
      }.take(k)
  }

  test("TopKStr reduce-then-merge equals brute force under arbitrary splits") {
    val rnd = new Random(7)
    val xs = Seq.tabulate(400)(i =>
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(26)}x$i", (i % 5).toLong))
    val agg = new TopKStr(8)
    for (seed <- 1 to 20) {
      val r = new Random(seed)
      val parts = r.shuffle(xs).grouped(1 + r.nextInt(70)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === bruteS(xs, 8),
        s"split seed $seed diverged from brute force")
    }
  }

  test("TopKStr ties break by UTF-8 BYTE order — Spark/DuckDB binary " +
    "collation, NOT String.compareTo (which misorders supplementary chars)") {
    // U+FFFF is EF BF BF in UTF-8; U+10000 is F0 90 80 80 — byte order
    // puts U+FFFF first. UTF-16 compareTo would put U+10000 (surrogate
    // D800) first — the divergence this pin exists to catch.
    val lo = "\uffff"
    val hi = new String(Character.toChars(0x10000))
    assert(lo.compareTo(hi) > 0, "precondition: compareTo disagrees")
    val agg = new TopKStr(1)
    val xs = Seq((5L, hi, 0L), (5L, lo, 0L))
    for (order <- Seq(xs, xs.reverse)) {
      val got = agg.finish(order.foldLeft(agg.zero)(agg.reduce))
      assert(got.map(_.id) === Seq(lo), "UTF-8 byte order must win ties")
    }
  }

  test("TopKStr buffer never exceeds k; tag rides along") {
    val agg = new TopKStr(3)
    val b = (1 to 50).foldLeft(agg.zero)((acc, i) =>
      agg.reduce(acc, (i.toLong, f"s$i%03d", i.toLong * 2)))
    assert(b.length === 3)
    assert(b.map(_.id) === Seq("s050", "s049", "s048"))
    assert(b.map(_.tag) === Seq(100L, 98L, 96L))
  }
}
