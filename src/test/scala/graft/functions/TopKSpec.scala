package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** TopKScored algebra: the kept set must equal brute-force sort-take-k
  * for any partitioning of the input — reduce/merge order invariance is
  * what makes the aggregate oracle-checkable.
  */
class TopKSpec extends AnyFunSuite {
  import TopKScored.Entry

  private def brute(xs: Seq[(Double, Long, Long)], k: Int): Seq[Entry] =
    xs.map(t => Entry(t._1, t._2, t._3))
      .sortBy(e => (-e.score, e.id)).take(k)

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
}
