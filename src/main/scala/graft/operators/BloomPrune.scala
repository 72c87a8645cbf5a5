package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter semi-join pruning (SURVEY.md §2.11a; the manual twin of
  * Catalyst's `InjectRuntimeFilter`, for when the dim side is too big to
  * broadcast but its KEY SET still fits a few megabytes of bloom).
  *
  * The 100-TB problem this solves: `fact LEFT SEMI JOIN dim` with a
  * non-broadcastable dim shuffles the ENTIRE fact table — petabyte-scale
  * network traffic to keep, say, 2% of rows. A bloom filter over the dim
  * keys is a few MB regardless of fact size (1M keys @ 1% fpp ≈ 1.2 MB),
  * ships to every task as a literal, and drops ~98% of fact rows BEFORE
  * the exchange. The exact semi-join then runs on the survivors only, so
  * false positives (the `fpp` fraction that leak through) are removed and
  * the result is bit-identical to the plain semi-join — which is exactly
  * what the q84 DuckDB oracle checks.
  *
  * Mechanics: the filter is built distributed (partial blooms merged by
  * `DataFrameStatFunctions.bloomFilter`'s aggregate) over
  * `xxhash64(dimKey)` — inserted as LONGS, because that is the probe
  * format Spark's native `BloomFilterMightContain` expression expects
  * (`InjectRuntimeFilter` pairs `BloomFilterAggregate` with
  * `XxHash64(value)` the same way; seed 42 on both sides). Reusing the
  * native expression keeps the probe inside codegen instead of a UDF.
  *
  * Prefer Spark's automatic runtime filter (`spark.sql.optimizer.runtime
  * .bloomFilter.*`, asserted in PlanSpec) when its heuristics fire; this
  * operator is for when they don't — no selective predicate on the dim,
  * a pre-computed key set reused across queries, or thresholds tuned for
  * clusters, not this job.
  */
object BloomPrune {

  /** Serialized bloom filter (the `BloomFilterMightContain` wire format)
    * over `xxhash64(keyCol)` of `keys`. */
  def buildFilter(keys: DataFrame, keyCol: String,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = keys.select(xxhash64(col(keyCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe: `might_contain(filter, xxhash64(key))`. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(filter)),
      Bridge.expression(xxhash64(key))))

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, with the
    * fact side bloom-pruned before the exchange. Result is exactly the
    * plain semi-join's (the semi-join removes bloom false positives).
    *
    * @param expectedItems sizing for the bloom — an upper bound on
    *   distinct dim keys (overshooting costs memory linearly; under-
    *   shooting inflates the real fpp, never correctness)
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val filter = buildFilter(dim, dimKey, expectedItems, fpp)
    val dimKeys = dim.select(col(dimKey).as("__bp_key"))
    fact.filter(mightContain(filter, col(factKey)))
      .join(dimKeys, col(factKey) === col("__bp_key"), "left_semi")
  }
}
