package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase
import graft.core.Tables

/** The UDF escape hatch: value-equivalent to its expression twin, and
  * the optimizer-opacity cost is pinned so it stays documented. */
class UdfsSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("registered UDF is callable from SQL and agrees with the Scala fn") {
    Udfs.register(spark)
    val out = spark.sql("SELECT graft_slugify('  Hello, World!! 42 ') AS s").head().getString(0)
    assert(out === "hello-world-42")
    assert(out === Udfs.slugify("  Hello, World!! 42 "))
  }

  test("UDF and column-expression twin agree on every document title-ish text") {
    Udfs.register(spark)
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    val diff = docs.select(
        callUDF("graft_slugify", substring($"text", 1, 40)).as("viaUdf"),
        Udfs.slugifyExpr(substring($"text", 1, 40)).as("viaExpr"))
      .filter($"viaUdf" =!= $"viaExpr" ||
        ($"viaUdf".isNull !== $"viaExpr".isNull))
      .count()
    assert(diff == 0)
  }

  test("the cost is visible: the expression twin constant-folds at plan " +
    "time, the UDF stays an opaque ScalaUDF call") {
    Udfs.register(spark)
    val twin = spark.range(1).select(Udfs.slugifyExpr(lit("Hello, World")).as("s"))
    val viaUdf = spark.range(1).select(callUDF("graft_slugify", lit("Hello, World")).as("s"))
    val twinPlan = twin.queryExecution.optimizedPlan.toString
    val udfPlan = viaUdf.queryExecution.optimizedPlan.toString
    // ConstantFolding already evaluated the expression form…
    assert(twinPlan.contains("hello-world") && !twinPlan.toLowerCase.contains("regexp_replace"), twinPlan)
    // …while the UDF call survives to runtime untouched
    assert(udfPlan.contains("graft_slugify") || udfPlan.contains("UDF"), udfPlan)
    assert(!udfPlan.contains("hello-world"), udfPlan)
  }
}
