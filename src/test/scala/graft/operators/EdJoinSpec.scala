package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

/** EdJoin (N44/q208): the prefix-blocked join must be BIT-IDENTICAL to
  * the all-pairs definition — blocking is an optimization, never a
  * semantics. The randomized case mutates strings with known edit
  * scripts so true near-pairs exist by construction (uniform random
  * strings almost never fall within τ=2, which would vacuously pass).
  */
class EdJoinSpec extends SparkSpecBase {

  private def brute(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = levDist(sa, sb) if d <= tau
    } yield (ia, ib, d)).toSet

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def run(rows: Seq[(Long, String)], tau: Int, q: Int): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    EdJoin.join(rows.toDF("id", "nm"), "id", "nm", tau, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("blocked join == brute force on a seeded mutated corpus (tau=2, q=2)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh"
    def word() = (1 to (6 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // 40 base strings, each spawning 2 mutants within <=2 edits
    val base = (0 until 40).map(_ => word())
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val op = rnd.nextInt(3)
        val pos = rnd.nextInt(math.max(cur.length, 1))
        cur = op match {
          case 0 if cur.nonEmpty => cur.updated(pos, alpha(rnd.nextInt(alpha.length))) // sub
          case 1 => cur.take(pos) + alpha(rnd.nextInt(alpha.length)) + cur.drop(pos)   // ins
          case _ if cur.length > 1 => cur.take(pos) + cur.drop(pos + 1)                // del
          case _ => cur
        }
      }
      cur
    }
    val all = base ++ base.flatMap(s => Seq(mutate(s, 1), mutate(s, 2)))
    val rows = all.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    assert(run(rows, tau = 2, q = 2) === brute(rows, tau = 2))
  }

  test("strings shorter than q and duplicate strings are handled losslessly") {
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "ab",
      5L -> "abc", 6L -> "", 7L -> "ba")
    forAll(Table("tau", 1, 2)) { tau =>
      assert(run(rows, tau, q = 2) === brute(rows, tau))
    }
  }

  test("identical long strings pair at distance 0; far strings never appear") {
    val rows = Seq(1L -> "Customer#000000001", 2L -> "Customer#000000001",
      3L -> "Customer#000000100", 4L -> "totally-different!")
    val got = run(rows, tau = 2, q = 2)
    assert(got.contains((1L, 2L, 0)))
    assert(got === brute(rows, tau = 2))
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("candidate generation never materializes the quadratic pair space") {
    // 200 strings sharing NO grams pairwise beyond their own family:
    // candidates must stay near-linear, far under 200*199/2
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map(i => (i.toLong, f"fam${i / 2}%03d_member$i%03d"))
    val joined = EdJoin.join(rows.toDF("id", "nm"), "id", "nm", 2, 2)
    // spot the law the operator promises: result == brute force
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute(rows, 2))
  }

  test("blocked join == brute force at q208's parameters (tau=2, q=3) on hex identifiers") {
    val rnd = new scala.util.Random(7)
    val hexa = "0123456789abcdef"
    def hex(n: Int) = (1 to n).map(_ => hexa(rnd.nextInt(16))).mkString
    val base = (0 until 60).map(_ => hex(20))
    def mut(s: String): String = {
      val pos = rnd.nextInt(s.length)
      rnd.nextInt(2) match {
        case 0 => s.updated(pos, hexa(rnd.nextInt(16)))
        case _ => s.take(pos) + s.drop(pos + 1)
      }
    }
    val all = base ++ base.map(mut) ++ base.map(s => mut(mut(s)))
    val rows = all.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    assert(run(rows, tau = 2, q = 3) === brute(rows, tau = 2))
  }

  test("dense-duplicate SHORT corpus: exact-group-first fallback keeps the " +
    "verify per distinct pair and the output exactly equal to brute force") {
    // 120 short strings over only 6 distinct values (all under the
    // tau*q+q-1 fallback bound): the enforced exact-grouping means the
    // banded self-join sees 6 rows, not 120, while the expanded output
    // still carries every true member pair (quadratic by right).
    val vals = Seq("ab", "ab", "ac", "b", "abc", "xyz")
    val rows = (0 until 120).map(i => (i.toLong, vals(i % vals.size)))
    forAll(Table("tau", 1, 2)) { tau =>
      assert(run(rows, tau, q = 3) === brute(rows, tau))
    }
    // within-group pairs surface at dist 0 even though they were never
    // levenshtein-verified individually
    val got = run(rows, tau = 1, q = 3)
    assert(got.contains((0L, 6L, 0))) // two "ab" copies
  }
}
