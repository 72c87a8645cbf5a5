package graft.operators

import graft.SparkSpecBase
import graft.core.Barriers._
import org.apache.spark.sql.functions._

/** The broadcast-join ADC LUT path (r8 verdict item 3): identical
  * answers to the plan-literal path, at a query-batch size the literal
  * path should never be asked to carry, with the promised plan shape —
  * LUTs as broadcast DATA, scoring a shuffle-free projection, one
  * exchange total (the bounded top-k's final aggregate).
  */
class PqLutJoinSpec extends SparkSpecBase {

  private def mkVecs(n: Int) = {
    val s = spark
    import s.implicits._
    // deterministic integer-born vectors, dim 16 (m=4 subspaces of 4)
    s.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => ($"id" * 7 + d * 13) % 97 + 100L).as("xq"))
  }

  test("adcTopKJoin == adcTopK (literal path) at |Q| = 1000") {
    val s = spark
    import s.implicits._
    val sub = ProductQuantizer.subVectorsQ(mkVecs(1000), "vec_id",
      m = 4, subDims = 4).persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k = 4, rounds = 2)
    val codes = ProductQuantizer.encode(sub, "vec_id", cents)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"rn".cast("long"), $"vec_id", $"adist")
        .orderBy("q_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val literal = key(ProductQuantizer.adcTopK(codes, "vec_id",
      sub, "vec_id", cents, m = 4, k = 4, topK = 3))
    val joined = key(ProductQuantizer.adcTopKJoin(codes, "vec_id",
      ProductQuantizer.lutFrame(sub, "vec_id", cents, m = 4, k = 4),
      m = 4, k = 4, topK = 3))
    sub.unpersist()
    assert(literal.size === 3000)
    assert(joined === literal)
  }

  test("join-path plan: LUTs broadcast as data, zero-shuffle scoring, " +
    "ONE exchange (the top-k aggregate)") {
    val s = spark
    import s.implicits._
    val sub = ProductQuantizer.subVectorsQ(mkVecs(64), "vec_id",
      m = 4, subDims = 4).persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k = 4, rounds = 1)
    // barrier index + LUTs so the pinned plan is the SERVE plan alone,
    // not the (already-audited) build lineage
    val codes = ProductQuantizer.encode(sub, "vec_id", cents).barrier()
    val lutF = ProductQuantizer.lutFrame(
      sub.filter($"vec_id" < 8), "vec_id", cents, m = 4, k = 4).barrier()
    sub.unpersist()
    val out = ProductQuantizer.adcTopKJoin(codes, "vec_id", lutF,
      m = 4, k = 4, topK = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange".r.findAllMatchIn(plan).size -
      "BroadcastExchange".r.findAllMatchIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle exchange:\n$plan")
    assert(out.count() === 8 * 3)
  }

  test("scoreCandidates on a pruned stream == literal adcExpr scoring") {
    val s = spark
    import s.implicits._
    val sub = ProductQuantizer.subVectorsQ(mkVecs(200), "vec_id",
      m = 4, subDims = 4).persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k = 4, rounds = 2)
    val codes = ProductQuantizer.encode(sub, "vec_id", cents)
    val qSub = sub.filter($"vec_id" < 5)
    // a deterministic pruned candidate stream: every 3rd corpus id per query
    val cand = s.range(5).select($"id".as("q_id"))
      .crossJoin(s.range(200).select($"id".as("vec_id")))
      .filter($"vec_id" % 3 === $"q_id" % 3 && $"vec_id" =!= $"q_id")
    val luts = ProductQuantizer.buildLuts(qSub, "vec_id", cents, m = 4, k = 4)
    val literal = cand.join(codes, "vec_id")
      .select($"q_id", $"vec_id",
        ProductQuantizer.adcExpr(luts, $"q_id", $"codes", m = 4, k = 4).as("adist"))
      .orderBy("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val joined = ProductQuantizer.scoreCandidates(cand, codes, "vec_id",
        ProductQuantizer.lutFrame(qSub, "vec_id", cents, m = 4, k = 4),
        m = 4, k = 4)
      .orderBy("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    sub.unpersist()
    assert(literal.nonEmpty && joined === literal)
  }
}
