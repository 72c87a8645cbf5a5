package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (X30): keep a grouped summary
  * table fresh by folding in a DELTA batch instead of re-aggregating
  * the full history — the incremental-view-maintenance primitive every
  * warehouse refresh pipeline needs once the fact table outgrows its
  * refresh window (at 100 TB a full re-aggregate is a full-table scan;
  * the merge touches only the delta plus the summary, which is
  * |distinct keys| rows, not |history| rows).
  *
  * Works for any SELF-MERGEABLE aggregate state: count and sum merge
  * by +, min/max by min/max — `avg` is maintained as (sum, count) and
  * rendered at read time, the standard decomposition. Non-mergeable
  * aggregates (exact distinct, median) need sketch states instead
  * (HLL A4, Misra-Gries X20) — that is a property of the aggregate,
  * not of this operator.
  *
  * Plan shape: aggregate the delta (map-side partial, shuffle carries
  * one row per delta key), union with the prior summary, and merge
  * with one more compact aggregation. The prior summary is never
  * re-derived from facts; `merge(merge(s, d1), d2)` equals the full
  * re-aggregate by associativity+commutativity of the merge functions
  * (pinned by ExtendedSpec and the q101 oracle, which IS the full
  * re-aggregate).
  */
object IncrementalAgg {

  /** Summary schema: keyCols ++ (n, sum_<m>, min_<m>, max_<m> per measure). */
  def summarize(facts: DataFrame, keyCols: Seq[String],
                measures: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n") +:
        measures.flatMap(m => Seq(
          sum(col(m)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m")))
    facts.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta SUMMARY into a prior summary (both from [[summarize]]
    * with the same keys/measures). Keys new in the delta appear; keys
    * absent from the delta pass through untouched. */
  def merge(prior: DataFrame, delta: DataFrame, keyCols: Seq[String],
            measures: Seq[String]): DataFrame = {
    val merged: Seq[Column] =
      sum(col("n")).as("n") +:
        measures.flatMap(m => Seq(
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m")))
    prior.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Convenience: maintain the summary given prior summary + raw delta
    * facts. */
  def refresh(prior: DataFrame, deltaFacts: DataFrame, keyCols: Seq[String],
              measures: Seq[String]): DataFrame =
    merge(prior, summarize(deltaFacts, keyCols, measures), keyCols, measures)

  // ---- distinct-count maintenance via HLL sketches (Spark 4 native
  // DataSketches functions). Exact distinct is NOT mergeable (the very
  // reason the count/sum/min/max summary above can't carry it); the HLL
  // register array IS: register-wise max is commutative/associative, so
  // base ⊕ delta produces the IDENTICAL sketch bytes a full rebuild
  // produces — incremental estimates don't drift, they are bit-equal to
  // the full-scan estimate (pinned in ExtendedSpec). Standard relative
  // error at the default lgConfigK=12 is ~1.6%.

  /** (keyCols..., sketch) — HLL sketch of `distinctCol` per key. */
  def summarizeDistinct(facts: DataFrame, keyCols: Seq[String],
                        distinctCol: String): DataFrame =
    facts.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol)).as("sketch"))

  /** Fold a delta sketch summary into a prior one (register-wise max). */
  def mergeDistinct(prior: DataFrame, delta: DataFrame,
                    keyCols: Seq[String]): DataFrame =
    prior.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Render estimates: (keyCols..., n_distinct_est). */
  def estimateDistinct(summary: DataFrame, keyCols: Seq[String]): DataFrame =
    summary.select(keyCols.map(col) :+
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"): _*)

  // ---- EXACT quantile maintenance via value histograms (X50). Exact
  // quantiles are not mergeable as scalars (the median of medians is
  // not the median) — but the per-key VALUE HISTOGRAM (value, count)
  // is, by plain +, and over a quantized domain (2dp money, integer
  // lengths, bucketed floats) it is value-domain-sized, not
  // fact-sized. Quantiles then read out as exact rank statistics: the
  // value at rank ceil(q·n) is min{v : 100·cum(v) >= q·n}, computed by
  // a [[PrefixScan]] over the histogram — q105's boundary device, made
  // incrementally maintainable. Unlike KLL/t-digest sketches
  // (randomized compaction, merges not bit-reproducible), base ⊕ delta
  // here IS the full-rebuild histogram, so maintained quantiles equal
  // the full re-aggregate EXACTLY — they hash-match a DuckDB oracle
  // (q139), no tolerance gate needed.

  /** (keyCols..., valueCol, cnt) — mergeable histogram summary. */
  def summarizeHist(facts: DataFrame, keyCols: Seq[String],
                    valueCol: String): DataFrame =
    facts.groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Fold a delta histogram into a prior one (counts add). */
  def mergeHist(prior: DataFrame, delta: DataFrame, keyCols: Seq[String],
                valueCol: String): DataFrame =
    prior.unionByName(delta)
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Exact percentiles from a histogram: one PrefixScan + one
    * aggregation. `percentiles` maps output column name -> integer
    * percent (value at rank ceil(p·n/100), the q105 rank statistic). */
  def histQuantiles(hist: DataFrame, keyCols: Seq[String], valueCol: String,
                    bucket: Column => Column,
                    percentiles: Seq[(String, Int)]): DataFrame = {
    val scanned = PrefixScan.inclusive(hist, keyCols, valueCol, Nil, "cnt",
      bucket, "__cum", Some("__n"))
    val aggs = count(lit(1)).as("n_values") +:
      percentiles.map { case (name, p) =>
        min(when(col("__cum") * 100 >= col("__n") * p, col(valueCol))).as(name)
      }
    scanned.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
