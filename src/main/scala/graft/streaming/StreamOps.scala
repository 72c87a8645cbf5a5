package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming transform surface (SURVEY.md §2.9 T2-T6, T8).
  *
  * Every builder here is a pure LogicalPlan transform that works on BOTH
  * a batch DataFrame and a `readStream` DataFrame — Structured
  * Streaming's core guarantee, and the property that lets the batch
  * DuckDB oracle vouch for the windowing arithmetic while MemoryStream
  * tests vouch for the incremental execution (watermarks, state,
  * late-data handling — things a batch engine cannot model).
  *
  * Scale posture: windowed aggregations shuffle on (window, key) — state
  * store size is bounded by watermark horizon × key cardinality, the
  * knob that keeps 100 TB/day streams in executor memory. Stream-static
  * joins broadcast the static dim per micro-batch.
  */
object StreamOps {

  /** T2 — tumbling-window counts per key (events/min by type). */
  def tumblingCounts(df: DataFrame, tsCol: String, keyCol: String,
                     width: String): DataFrame =
    df.groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol), col("n"))

  /** T3 — sliding-window counts (overlapping windows). */
  def slidingCounts(df: DataFrame, tsCol: String, keyCol: String,
                    width: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol), col("n"))

  /** T4 — gap-based session windows per key. The batch-equivalent
    * lag+cumsum sessionization (W2 idiom) is oracle-checked as
    * q30_sessionize; this is the streaming-native form. */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col(keyCol), col("n_events"))

  /** T5 — watermarked tumbling counts: rows later than `delay` behind
    * the max seen ts are dropped and their windows finalized. */
  def watermarkedCounts(df: DataFrame, tsCol: String, keyCol: String,
                        width: String, delay: String): DataFrame =
    tumblingCounts(df.withWatermark(tsCol, delay), tsCol, keyCol, width)

  /** T6 — streaming dedup by id with bounded state. */
  def dedup(df: DataFrame, tsCol: String, delay: String,
            idCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicates(idCols :+ tsCol)

  /** T8 — enrich a stream with a static dimension (broadcast per
    * micro-batch; keys must match by name). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** T11 — stream-stream inner join within an event-time bound: left
    * rows pair with right rows at most `within` AFTER them (impression →
    * click attribution, request → response correlation). BOTH sides
    * carry watermarks and the join condition bounds right.ts to
    * [left.ts, left.ts + within] — the two constraints Spark needs to
    * know when a buffered row can never match again, which is what
    * bounds the join STATE (otherwise both streams buffer forever; at
    * 100 TB/day an unbounded stream-stream join is an OOM scheduled in
    * advance). Column names must be disambiguated by the caller via
    * distinct prefixes. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       leftTs: String, rightTs: String, key: String,
                       rightKey: String, within: String,
                       delay: String): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay),
        col(key) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))

  /** T11b — LEFT OUTER stream-stream join, same event-time bound as
    * [[streamStreamJoin]]: the "impressions with NO click" shape
    * (conversion-failure feeds, SLA breach detection). Semantics Spark
    * guarantees here: an unmatched left row is held in state until the
    * WATERMARK passes the end of its match window — only then can the
    * engine prove no match will ever arrive — and the null-padded row
    * emits in a subsequent micro-batch. Same two state-bounding
    * constraints as the inner form; without them the outer join cannot
    * emit null rows at all (no way to prove absence). */
  def streamStreamJoinOuter(left: DataFrame, right: DataFrame,
                            leftTs: String, rightTs: String, key: String,
                            rightKey: String, within: String,
                            delay: String): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay),
        col(key) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
        "left_outer")

  /** T13 — streaming drift monitor, the incremental form of q157's
    * total-variation report: the STREAM carries only the stateful
    * windowed count (one aggregation — Structured Streaming's
    * single-stateful-agg rule), and [[finishDrift]] completes the
    * share/drift arithmetic per micro-batch inside foreachBatch (the
    * T9 sink pattern), where window totals are batch-local and free.
    * Baseline shares are a static (key, base_ppm) frame broadcast per
    * batch. State is bounded by watermark horizon x key cardinality. */
  def windowedKeyCounts(df: DataFrame, tsCol: String, keyCol: String,
                        width: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Finishing step for [[windowedKeyCounts]] — pure batch transform
    * (exactly q157's integer-ppm arithmetic), usable identically on a
    * foreachBatch micro-batch or a full batch frame: per (window, key),
    * observed share in ppm vs the baseline's, drift = |obs - base|. */
  def finishDrift(counts: DataFrame, keyCol: String,
                  baseline: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("win_start"))
      .agg(sum(col("n").cast("decimal(38,0)")).as("win_total"))
    counts.join(broadcast(totals), "win_start")
      .join(broadcast(baseline), keyCol)
      .select(col("win_start"), col(keyCol), col("n"),
        // per-window counts are unbounded at 100 TB event rates, so the
        // ×10⁶ ppm step runs in DECIMAL(38,0) (floored back to BIGINT)
        expr("(cast(n as decimal(38,0)) * 1000000) DIV win_total")
          .as("obs_ppm"), col("base_ppm"))
      .withColumn("drift_ppm", abs(col("obs_ppm") - col("base_ppm")))
  }
}
