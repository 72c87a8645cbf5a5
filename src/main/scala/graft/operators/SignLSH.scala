package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Random-hyperplane (sign) LSH over embedding columns — the scale path
  * for similarity search / embedding near-dup (SURVEY.md §2.10 N11).
  *
  * Bucket id = the sign pattern of the vector's dot products with
  * `planes` fixed pseudo-random hyperplanes (Charikar '02): cosine-close
  * vectors agree on most signs, so near-dups land in the same bucket and
  * the all-pairs cosine cross product collapses to per-bucket equi-join
  * groups. Sign bits are scale-invariant, so a rescaled copy of a vector
  * keeps its bucket exactly.
  *
  * Hyperplane coefficients are NOT drawn from an RNG: coefficient
  * (p, d) = intval(first 2 hex digits of md5("p:d")) - 127.5, computed
  * once on the driver. They are a pure function of (plane, dim) — any
  * engine (the DuckDB oracle included) reproduces them from the same
  * formula, and integer-minus-0.5 values are exact in binary so SQL text
  * round-trips losslessly.
  *
  * Scale posture: bucketing is a per-row projection (no shuffle); the
  * pair join shuffles on the 1-byte bucket id. With b planes the corpus
  * splits into 2^b buckets; pick b ~ log2(N / targetBucketSize). Skew:
  * md5-derived planes are fixed, so a pathologically clustered corpus
  * concentrates buckets — AQE skew-join handles moderate cases, re-
  * bucketing with more planes is the structural fix.
  */
object SignLSH {

  /** coefficient(p, d) for plane p, 1-based dim d — see scaladoc. */
  def coefficient(p: Int, d: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
      .take(1).map(b => f"$b%02x").mkString
    Integer.parseInt(hex, 16) - 127.5
  }

  /** Bucket id column: Σ_p 2^p · [dot(vec[1..dims], plane_p) > 0].
    * Inlined 64·planes-term expression — codegen'd, no md5 at runtime. */
  def bucket(vec: Column, planes: Int = 8, dims: Int = 16): Column =
    (0 until planes).map { p =>
      val dot = (1 to dims).map(d =>
          element_at(vec, d).cast(DoubleType) * lit(coefficient(p, d)))
        .reduceLeft(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB twin of `bucket` — same formula rendered as SQL text, so the
    * oracle computes bit-identical bucket ids. */
  def bucketSql(vecExpr: String, planes: Int = 8, dims: Int = 16): String =
    (0 until planes).map { p =>
      val dot = (1 to dims)
        .map(d => s"CAST($vecExpr[$d] AS DOUBLE) * ${coefficient(p, d)}")
        .mkString(" + ")
      s"(CASE WHEN $dot > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Pairs (aId < bId) sharing a bucket with cosine >= minCosine.
    * Input: (idCol: long, vecCol: array<float>). Exact within-bucket
    * verify via graft.functions.VectorOps.cosine. */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   minCosine: Double, planes: Int = 8, dims: Int = 16): DataFrame = {
    // Both self-join sides re-project the bucket (8 planes x 16 dims of
    // arithmetic per row) and re-scan the vectors; persist computes it once.
    val keyed = vecs.select(col(idCol), col(vecCol),
      bucket(col(vecCol), planes, dims).as("__bucket")).persist()
    keyed.as("a").join(keyed.as("b"),
        col("a.__bucket") === col("b.__bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos",
        graft.functions.VectorOps.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos") >= minCosine)
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"), col("cos"))
  }
}
