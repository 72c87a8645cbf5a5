package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase
import graft.core.Tables
import graft.functions.VectorOps

/** The native expression must be bit-identical to the HOF fold it
  * replaces (the DuckDB oracle contract rides on that). */
class FloatVectorDotSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("codegen dot == HOF dot bit-for-bit on the whole embeddings table") {
    val e = Tables(spark, sf, "embeddings")
    val diff = e.select(
        VectorOps.dot($"embedding", $"embedding").as("native"),
        VectorOps.dotHof($"embedding", $"embedding").as("hof"))
      .filter($"native" =!= $"hof") // IEEE equality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("null semantics match the HOF idiom: null array, unequal lengths, " +
    "and null elements all yield null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),  // 11.0
      (None, Some(Seq(1.0f, 1.0f))),                   // null array
      (Some(Seq(1.0f)), Some(Seq(1.0f, 1.0f)))         // unequal length
    ).toDF("a", "b")
    for (d <- Seq(VectorOps.dot(_, _), VectorOps.dotHof(_, _))) {
      val rows = df.select(d($"a", $"b").as("d")).collect()
      assert(rows(0).getDouble(0) == 11.0)
      assert(rows(1).isNullAt(0))
      assert(rows(2).isNullAt(0))
    }
    // null ELEMENT -> null, both eval paths
    val withNullElem = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
    for (d <- Seq(VectorOps.dot(_, _), VectorOps.dotHof(_, _)))
      assert(withNullElem.select(d($"a", $"b")).head().isNullAt(0))
  }

  test("non-nullable array inputs: expression still declares nullable and " +
    "returns null on unequal lengths (codegen must not constant-fold isNull)") {
    // array(lit(...)) columns are non-nullable with non-null elements —
    // before the `nullable=true` override this shape made nullSafeCodeGen
    // emit an assignment to literal `false` (codegen compile failure ->
    // silent interpreted fallback) and violated the non-null contract.
    val df = spark.range(1).select(
      array(lit(1.0f), lit(2.0f)).as("a"),
      array(lit(3.0f)).as("b"),
      array(lit(3.0f), lit(4.0f)).as("c"))
    assert(!df.schema("a").nullable)
    val out = df.select(
      VectorOps.dot($"a", $"b").as("uneq"),
      VectorOps.dot($"a", $"c").as("eq"))
    assert(out.schema("uneq").nullable && out.schema("eq").nullable)
    val row = out.head()
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == 11.0)
  }

  test("the similarity inner loop stays inside whole-stage codegen") {
    val e = Tables(spark, sf, "embeddings").limit(50)
    val df = e.crossJoin(broadcast(e.select($"embedding".as("q"))))
      .select(VectorOps.dot($"embedding", $"q").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(")) // WholeStageCodegen marker survives
  }
}
