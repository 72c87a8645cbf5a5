package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.operators.MinHashLSH
import StreamingNearDup.CandidatePair

/** T16 — streaming VERIFIED near-dup pairs end-to-end (SURVEY §2.9 +
  * §2.10 N10): [[StreamingNearDup]] candidates composed with a
  * stream-static exact-Jaccard verify against the shingle store — the
  * same two-stage contract as the batch
  * [[graft.operators.MinHashLSH.nearDupPairs]] (LSH recalls, Jaccard
  * decides), so the streaming path emits the SAME verified pairs the
  * batch operator computes over the accumulated corpus (pinned in
  * StreamingSpec), discovered incrementally as documents arrive.
  *
  * The shingle store is the T8 stream-static device: a static frame of
  * (id, distinct hashed shingle set) — in production the S11 upsert
  * index that the ingest pipeline maintains (foreachBatch writing
  * [[graft.operators.MinHashLSH.shingleSets]] rows). Store consistency
  * contract, stated loudly: a candidate pair verifies in the
  * micro-batch where BOTH members' shingle rows are visible to the
  * static side; a pair whose store rows lag its candidate emission is
  * dropped by the inner join, not retried — size the index refresh
  * interval accordingly (or backfill with the batch operator, which is
  * the same math).
  *
  * Plan shape: candidates are (a_id, b_id, band) longs; the verify
  * joins attach the two shingle arrays only to CANDIDATE rows — the
  * store never self-joins and the stream never carries text, identical
  * to the batch operator's "shingle sets join only the rare survivors"
  * posture. Cross-band repeats are deduped BEFORE the joins
  * (dropDuplicates on the pair key — stateful, unbounded by the same
  * remember-all-history semantic as the candidate stage; the retention
  * mode's bounded variant pairs with a withWatermark + dropDuplicates
  * window downstream, the T6 device).
  */
object StreamingVerifiedDedup {

  /** Verify candidate pairs against a static shingle store.
    * `shingleStore` needs (idCol: long, shCol: array<long>) — build it
    * with [[graft.operators.MinHashLSH.shingleSets]]. Output columns:
    * (a_id, b_id, jaccard), append mode. */
  def verifiedPairs(cands: Dataset[CandidatePair], shingleStore: DataFrame,
                    idCol: String, shCol: String,
                    minJaccard: Double): DataFrame = {
    val sets = shingleStore.select(col(idCol), col(shCol))
    cands.toDF()
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .join(sets.select(col(idCol).as("a_id"), col(shCol).as("sh_a")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col(shCol).as("sh_b")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** End-to-end: streaming docs → banded candidates → store-verified
    * pairs, mirroring the batch `nearDupPairs(docs, …, minJaccard)`
    * signature. `docs` is the streaming (idCol, textCol) frame;
    * `shingleStore` the static (storeIdCol, storeShCol) index. */
  def verified(docs: DataFrame, idCol: String, textCol: String,
               shingleStore: DataFrame, storeIdCol: String,
               storeShCol: String, minJaccard: Double,
               k: Int = 3, numHashes: Int = 12,
               bands: Int = 4, rows: Int = 3,
               maxBucketSize: Int = MinHashLSH.DefaultMaxBucket): DataFrame =
    verifiedPairs(
      StreamingNearDup.candidates(docs, idCol, textCol, k, numHashes,
        bands, rows, maxBucketSize),
      shingleStore, storeIdCol, storeShCol, minJaccard)
}
