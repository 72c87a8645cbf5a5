package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X118 pins — the MMR greedy must actually DIVERSIFY, not just
  * re-emit the relevance order: on a corpus where the top relevance
  * ranks are near-copies of one another, the picked set demotes the
  * redundant copies below a less-relevant but novel document. Also
  * pins the integer Jaccard device and the pick-1-is-pure-relevance
  * law on the real sf0.001 corpus.
  */
class MmrSpec extends SparkSpecBase {
  import spark.implicits._

  test("pick 1 is the pure-relevance winner on the real corpus") {
    val got = Retrieval.q291.build(spark, sf).collect()
    assert(got.length == 8)
    assert(got.map(_.getLong(0)).toSeq == (1L to 8L))
    // pick 1's mmr is its rel_norm (max-sim 0 against an empty set):
    // rank 1 → ((21-1)·10⁶) DIV 20 = 10⁶
    assert(got.head.getLong(2) == 1000000L)
    // all picks distinct
    assert(got.map(_.getLong(1)).distinct.length == 8)
  }

  test("redundant near-copies are demoted below a novel document") {
    // docs 0..3: identical high-relevance near-copies ("spark stream"
    // heavy); doc 4: less relevant but disjoint vocabulary after the
    // query terms. Pure relevance would rank 0,1,2,3 first; MMR must
    // pull the novel doc 4 forward past at least one copy.
    val docs = (
      (0L to 3L).map(i => (i, "spark stream spark stream alpha beta gamma")) :+
        (4L, "spark delta epsilon zeta eta theta iota kappa") :+
        (5L, "w w w w w w w w")
      ).toDF("doc_id", "text")
    // replicate q291's greedy on this fixture via the same arithmetic
    val ts = docs.select($"doc_id", array_distinct(split($"text", " ")).as("t"))
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet).toMap
    // relevance order (by construction): 0,1,2,3 then 4 (doc 5 has no hit)
    val rel = Seq(0L, 1L, 2L, 3L, 4L).zipWithIndex
      .map { case (id, i) => (id, ((21L - (i + 1)) * 1000000L) / 20L) }
    def sim(a: Long, b: Long): Long = {
      val (x, y) = (ts(a), ts(b))
      val inter = x.intersect(y).size.toLong
      val union = x.size.toLong + y.size.toLong - inter
      if (union == 0) 0L else inter * 1000000L / union
    }
    var chosen = Vector.empty[Long]
    for (_ <- 1 to 3) {
      val best = rel.filterNot(c => chosen.contains(c._1))
        .map { case (id, r) =>
          val ms = if (chosen.isEmpty) 0L else chosen.map(sim(id, _)).max
          (r - ms, id)
        }
        .reduce((x, y) =>
          if (x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)) x else y)
      chosen = chosen :+ best._2
    }
    assert(chosen.head == 0L, "pick 1 must be the relevance winner")
    assert(chosen.contains(4L),
      s"the novel doc must enter the top-3 picks, got $chosen")
    assert(chosen != Vector(0L, 1L, 2L),
      "MMR degenerated to the pure relevance order")
  }
}
