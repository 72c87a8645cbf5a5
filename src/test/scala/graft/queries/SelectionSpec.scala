package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Invariants for the selection/scoring family (q178-q181) beyond the
  * DuckDB value gate: decay boundedness, allocation exactness, and fold
  * coverage.
  */
class SelectionSpec extends SparkSpecBase {

  test("q178 decayed score is positive and bounded by the undecayed sum") {
    import spark.implicits._
    val scored = Selection.q178.build(spark, sf)
      .select($"user_id", $"score_micro").as[(Long, Long)].collect().toMap
    assert(scored.nonEmpty)
    val raw = graft.core.Tables(spark, sf, "events")
      .groupBy($"user_id")
      .agg(sum(expr("CAST(rint(value * 1000000.0) AS BIGINT)")).as("m"))
      .as[(Long, Long)].collect().toMap
    scored.foreach { case (u, sc) =>
      assert(sc > 0L && sc <= raw(u),
        s"user $u: decayed $sc outside (0, ${raw(u)}]")
    }
  }

  test("q180 Neyman allocation sums to exactly k = 1000") {
    val total = Selection.q180.build(spark, sf)
      .agg(sum("alloc")).collect()(0).getLong(0)
    assert(total === 1000L)
  }

  test("q181 group folds cover all customers exactly once") {
    import spark.implicits._
    val df = Selection.q181.build(spark, sf).cache()
    try {
      val folds = df.select("fold").as[Long].collect().sorted
      assert(folds.forall(f => f >= 0 && f < 5))
      val nCust = df.agg(sum("n_customers")).collect()(0).getLong(0)
      assert(nCust === graft.core.Tables(spark, sf, "customer").count())
    } finally df.unpersist()
  }

  test("q179 oov fraction is a valid ppm and docs are worst-first") {
    import spark.implicits._
    val rows = Selection.q179.build(spark, sf)
      .select("mean_rank_ppm", "oov_ppm").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, o) => o >= 0 && o <= 1000000L })
    val ranks = rows.map(_._1)
    assert(ranks.sameElements(ranks.sortBy(-_)))
  }
}
