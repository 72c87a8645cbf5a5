package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpecBase {

  private def summarize(items: Seq[Long], capacity: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    val hh = udaf(new HeavyHitters(capacity))
    items.toDF("k").repartition(parts)
      .agg(hh($"k").as("hits"))
      .select(explode($"hits").as("h"))
      .select($"h.key", $"h.est").as[(Long, Long)].collect().toMap
  }

  test("exact regime: capacity >= distinct keys reproduces the group-count, " +
    "invariant to partitioning") {
    val items = (1L to 500L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i % 40))
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(summarize(items, capacity = 64, parts = 1) === exact)
    assert(summarize(items, capacity = 64, parts = 13) === exact)
  }

  test("differential vs Spark's native approx_top_k sketch in the exact " +
    "regime: same items, same counts") {
    val s = spark
    import s.implicits._
    val items = (1L to 4000L).map(i => i % (i % 13 + 1)) // skewed small-key dist
    val df = items.toDF("k")
    df.createOrReplaceTempView("hh_diff")
    val native = s.sql(
      "SELECT explode(approx_top_k(k, 5, 1024)) AS h FROM hh_diff")
      .select($"h.item".cast("long"), $"h.count".cast("long"))
      .as[(Long, Long)].collect().sortBy(t => (-t._2, t._1))
    val hh = udaf(new HeavyHitters(1024))
    val ours = df.agg(hh($"k").as("hits"))
      .select(explode($"hits").as("h")).select($"h.key", $"h.est")
      .as[(Long, Long)].collect().sortBy(t => (-t._2, t._1)).take(5)
    assert(ours.sameElements(native),
      s"ours=${ours.toSeq} native=${native.toSeq}")
  }

  test("lossy regime: any key above the N/(capacity+1) frequency bound " +
    "survives, with estimate within the MG error bound") {
    // hot key = 40% of a stream over ~1000 distinct cold keys, capacity 16
    val hot = Seq.fill(2000)(999999L)
    val cold = (1L to 3000L).map(_ % 1000 + 1)
    val n = (hot ++ cold).size.toLong
    val capacity = 16
    for (parts <- Seq(1, 8)) {
      val got = summarize(new scala.util.Random(42).shuffle(hot ++ cold), capacity, parts)
      assert(got.size <= capacity)
      val est = got.getOrElse(999999L,
        fail(s"hot key lost (freq ${hot.size}/$n > n/${capacity + 1})"))
      assert(est <= hot.size.toLong, "MG must never overestimate")
      assert(est > hot.size.toLong - n / (capacity + 1),
        s"estimate $est outside MG bound (true ${hot.size}, n=$n)")
    }
  }
}
