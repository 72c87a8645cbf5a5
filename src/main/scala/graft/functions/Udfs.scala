package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The scalar-UDF escape hatch (SURVEY.md §2.11 U-udf; reference
  * `README.md:64,85-86` — "custom logic" over ingested records).
  *
  * The engine's standing policy is ZERO UDFs in shipped operators:
  * everything is built-in functions or native Catalyst expressions,
  * because a Scala UDF is an optimizer BLACK BOX — Catalyst cannot
  * constant-fold it, push filters through it, prune columns behind it,
  * or reason about its null semantics (it conservatively wraps inputs
  * in null checks and blocks filter pushdown past the call).
  *
  * But users of the library WILL have one-off logic with no built-in
  * equivalent, and the supported answer is `spark.udf.register` — this
  * file is the documented example: [[slugify]] as a registered UDF and
  * [[slugifyExpr]] as its transparent column-expression twin. The spec
  * (`UdfsSpec`) pins both the value equivalence and the cost: the twin
  * constant-folds at plan time, the UDF stays an opaque `ScalaUDF` call.
  * Rule of thumb: write the expression form when the built-ins can spell
  * it; reach for the UDF only when they can't, and keep it OUT of scan
  * filters (it won't push down).
  */
object Udfs {

  /** URL/key slug: lowercase, alnum runs kept, everything else collapsed
    * to single dashes, edge dashes trimmed. */
  def slugify(s: String): String =
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")

  /** Register the UDF into the session's FunctionRegistry so SQL text
    * can call `graft_slugify(col)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_slugify", (s: String) => slugify(s)): Unit

  /** The same logic as a pure column expression — what the zero-UDF
    * policy prefers: codegen'd, constant-foldable, null-transparent. */
  def slugifyExpr(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "-"), "^-+|-+$", "")
}
