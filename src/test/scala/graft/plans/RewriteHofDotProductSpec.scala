package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase
import graft.core.Tables
import graft.functions.VectorOps

class RewriteHofDotProductSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofDotProduct
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("the HOF dot idiom rewrites to the native expression, same results") {
    val e = Tables(spark, sf, "embeddings").limit(100)
    withRule {
      val df = e.select($"vec_id",
        VectorOps.dotHof($"embedding", $"embedding").as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("float_vector_dot"), optimized)
      assert(!optimized.contains("aggregate("), optimized)
      // rewritten results == native results, bitwise
      val native = e.select($"vec_id",
        VectorOps.dot($"embedding", $"embedding").as("d")).collect()
      assert(df.collect().map(_.toSeq).toSeq === native.map(_.toSeq).toSeq)
    }
  }

  test("a FLOAT-multiply lambda ((x, y) -> x * y, no casts) is NOT rewritten " +
    "— it rounds each product to float, which differs by ULPs from the " +
    "double*double product the native expression computes") {
    withRule {
      val df = Tables(spark, sf, "embeddings").limit(10)
        .select(org.apache.spark.sql.functions.expr(
          "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)").as("s"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("float_vector_dot"), optimized)
      assert(df.count() == 10)
    }
  }

  test("non-matching aggregates are left alone") {
    withRule {
      // sum of (x + y) — not a product fold; must NOT rewrite
      val df = Tables(spark, sf, "embeddings").limit(10)
        .select(org.apache.spark.sql.functions.expr(
          "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) + CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)").as("s"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("float_vector_dot"), optimized)
      assert(df.count() == 10)
    }
  }
}
