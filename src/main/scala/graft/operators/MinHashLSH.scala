package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.10 N10).
  *
  * Classic shingle → minhash → band → bucket-join pipeline (Broder '97),
  * expressed entirely in codegen'd column expressions:
  *
  *   1. word k-shingles, distinct, per doc           (HOF, no shuffle)
  *   2. minhash signature: for seed j, min over shingles of
  *      H(j, s) = first 15 hex digits of md5(j || ':' || s)  (HOF)
  *   3. band keys: md5 of each `rows`-wide signature slice   (HOF)
  *   4. candidate pairs: self-equi-join on (band, key)       (ONE shuffle)
  *   5. verify: exact Jaccard over shingle sets, threshold   (join back)
  *
  * Scale posture: the only shuffles are the band-key equi-join and the
  * verify join — both on compact keys (16-byte band hash / doc id), never
  * on raw text. Candidate volume is controlled by (bands, rows): P(pair
  * surfaces) = 1-(1-j^rows)^bands, the standard S-curve. At 100 TB, band
  * keys are uniformly distributed md5s, so the bucket join has no
  * systematic skew; genuinely viral duplicates (>~10^4 copies of one
  * text) would need a per-bucket count cap upstream.
  *
  * Determinism: md5 is engine-agnostic (same bytes in Spark, DuckDB, any
  * engine), so signatures/bands/pairs are reproducible anywhere — no RNG,
  * no seed state. 15 hex digits = 60 bits, fits a signed long exactly.
  */
object MinHashLSH {

  /** Deterministic 60-bit hash of `s` under seed `j`. */
  def seededHash(j: Column, s: Column): Column =
    conv(substring(md5(concat(j.cast(StringType), lit(":"), s)), 1, 15), 16, 10)
      .cast(LongType)

  /** Distinct word k-shingles of a whitespace-tokenized text column.
    * Docs with fewer than k tokens yield an empty array (the `when`
    * guard matters: sequence(1, 0) would step BACKWARDS to [1, 0] and
    * element_at(tokens, 0) throws under ANSI mode). */
  def shingles(text: Column, k: Int = 3): Column = {
    val tokens = split(text, " ")
    when(size(tokens) >= k,
      array_distinct(
        transform(
          sequence(lit(1), size(tokens) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: array<long> of length numHashes. */
  def signature(shingleCol: Column, numHashes: Int = 12): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleCol, s => seededHash(j, s))))

  /** One md5 band key per `rows`-wide slice of the signature. */
  def bandKeys(sig: Column, bands: Int = 4, rows: Int = 3): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",",
        transform(slice(sig, b * lit(rows) + 1, lit(rows)), x => x.cast(StringType)))))

  /** Candidate pairs (aId < bId) whose signatures collide in >=1 band.
    * Input must have columns (idCol: long, textCol: string). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, numHashes: Int = 12,
                     bands: Int = 4, rows: Int = 3): DataFrame = {
    val ex = docs
      .withColumn("__sig", signature(shingles(col(textCol), k), numHashes))
      .select(col(idCol), posexplode(bandKeys(col("__sig"), bands, rows)).as(Seq("band", "key")))
    ex.as("a").join(ex.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
  }

  /** Full pipeline: candidates verified by exact shingle-set Jaccard. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double, k: Int = 3, numHashes: Int = 12,
                   bands: Int = 4, rows: Int = 3): DataFrame = {
    val withShingles = docs.select(col(idCol), shingles(col(textCol), k).as("sh"))
    val cands = candidatePairs(docs, idCol, textCol, k, numHashes, bands, rows)
    cands
      .join(withShingles.select(col(idCol).as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(withShingles.select(col(idCol).as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
