package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The oracle-exactness contract (SURVEY.md §5.2.1): decimal-routed
  * aggregates must be bit-identical across partitionings — that is the
  * property that makes hash-compare against DuckDB possible at all, and
  * the property that survives a move from local[32] to 1000 executors.
  */
class ExactSpec extends SparkSpecBase {

  test("dsum is bit-identical across partitionings") {
    val s = spark
    import s.implicits._
    val xs = (1 to 50000).map(i => (i % 997) + (i % 100) / 100.0)
    val df = s.sparkContext.parallelize(xs, 32).toDF("x")
    val a = df.repartition(1).agg(Exact.dsum(col("x"))).head().getDouble(0)
    val b = df.repartition(32).agg(Exact.dsum(col("x"))).head().getDouble(0)
    assert(a === b)
  }

  test("davg divides the exact sum by the count") {
    val s = spark
    import s.implicits._
    val df = Seq(1.10, 2.20, 3.30).toDF("x")
    val got = df.agg(Exact.davg(col("x"))).head().getDouble(0)
    assert(got === 6.6 / 3)
  }

  test("chained rate products stay exact (no DECIMAL(38) overflow rounding)") {
    val s = spark
    import s.implicits._
    val df = Seq((1000.25, 0.05, 0.08)).toDF("price", "disc", "tax")
    val got = df.select(
      Exact.toDbl(Exact.money(col("price")) * Exact.oneMinus(col("disc")) * Exact.onePlus(col("tax"))))
      .head().getDouble(0)
    // exact decimal: 1000.25 * 0.9500 * 1.0800 = 1026.25650
    assert(got === 1026.2565)
  }
}
