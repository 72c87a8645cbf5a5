package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase
import graft.core.Tables

/** Tolerance checks for the approximate operators that are deliberately
  * NOT oracle-hashed (SURVEY A4/A8): HLL distinct counts and
  * percentile_approx must land within their documented error bounds of
  * the exact answers. */
class ApproxSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("q24: approx_count_distinct(rsd=2%) within 5x rsd of exact per group") {
    val rows = Aggregates.q24.build(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf, "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === exact.keySet)
    rows.foreach { case (k, est) =>
      val e = exact(k).toDouble
      assert(math.abs(est - e) / e <= 0.10, s"$k: est=$est exact=$e")
    }
  }

  test("percentile_approx lands within 5% of exact percentile on l_quantity") {
    val df = Tables(spark, sf, "lineitem")
    val row = df.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / math.max(exact, 1.0) <= 0.05,
      s"exact=$exact approx=$approx")
  }
}
