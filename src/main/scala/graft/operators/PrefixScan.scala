package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation — the running sum / global rank
  * primitive `sum(w) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED
  * PRECEDING)` WITHOUT a per-group single-task sort (SURVEY.md §2.5
  * scale note; VERDICT r4 "de-skew the low-cardinality window family").
  *
  * `Window.partitionBy(k)` puts one partition VALUE on one task, so a
  * 3-value key (order status, return flag, source) caps the whole
  * window at 3 tasks no matter how many executors exist — works at
  * sf0.1, single-task-sorts a third of all data at 100 TB. This
  * operator is the two-phase form of the same computation, the
  * classic distributed scan (Blelloch, "Prefix Sums and Their
  * Applications", CMU-CS-90-190; the reference's README.md:20-24
  * "statistical queries" workload is where these ranks surface):
  *
  *   1. bucket the order axis with a DETERMINISTIC monotone function
  *      (`floor(value/width)` — no sampling, so results are stable
  *      across reprocessing and engines, unlike repartitionByRange);
  *   2. local running sums inside each (group, bucket) — the window
  *      partition key now has cardinality groups x buckets, sized to
  *      the cluster, and each task sorts only its bucket slice;
  *   3. per-bucket totals (reuses step 2's exchange — groupBy on a
  *      prefix of the window key), cumulated into per-bucket OFFSETS
  *      by a window over the bucket summary — `groups x buckets` rows,
  *      driver-small by construction, so its low-cardinality partition
  *      key is harmless;
  *   4. broadcast the offsets back: cum = bucket offset + local sum.
  *
  * Cost: ONE data-sized shuffle (step 2) + a metadata-sized summary
  * window + a broadcast — exactly what the single window costs, minus
  * the skew. (The bucket-totals branch re-scans the source with column
  * pruning but shuffles only map-side-combined partials — PlanSpec
  * pins "exactly one raw-data shuffle" on the whole plan.) Callers with tie-heavy order values collapse ties FIRST
  * (groupBy(group, value).count) and scan the distinct-value summary
  * with the count as weight — then rank-with-ties = exclusive cum + 1
  * and the scan input is value-domain-sized, not data-sized (q78,
  * q105, q130). Point lookups into the cumulative distribution
  * (q27's band boundary p-10000) ride the same scan as zero-weight
  * "query rows" ordered ahead of equal-valued data rows via `tieCols`,
  * so inclusive-cum at a query row reads count(v < x) exactly.
  *
  * Preconditions: `valueCol` non-null (enforced in-plan — a NULL order
  * value has no rank); `bucket` monotone non-decreasing in the value;
  * buckets-per-group bounded (pick width ~ domain / desired
  * parallelism — the offset table must stay broadcast-small). NULL
  * group values are fine: the offset join is null-safe, so they form
  * one ordinary group exactly as PARTITION BY would.
  */
object PrefixScan {

  /** Adds `cumCol` = running sum of `weightCol` over rows ordered by
    * (valueCol, tieCols...) within `groupCols`, INCLUSIVE of the
    * current row. Exclusive form: subtract the row's own weight.
    *
    * `totalCol` (optional) additionally attaches the per-GROUP total of
    * `weightCol` — the `n` every rank denominator needs. It rides the
    * same bucket-summary window and the same broadcast as the offsets,
    * so it costs zero extra jobs; a separate `groupBy(group).sum`
    * would re-run the caller's whole summary chain once more per
    * broadcast (measured 2x on q105 before this existed).
    */
  def inclusive(df: DataFrame, groupCols: Seq[String], valueCol: String,
                tieCols: Seq[String], weightCol: String,
                bucket: Column => Column, cumCol: String,
                totalCol: Option[String] = None): DataFrame = {
    val reserved = Seq("__pb", "__loc", "__off", "__bt")
    require(!df.columns.exists(reserved.contains),
      s"PrefixScan: input must not contain reserved columns ${reserved.mkString("/")}")
    val keyCols = groupCols :+ "__pb"
    // A NULL order value would bucket to NULL and silently vanish at
    // the offset join (dropped rows, not an error) — the MergeInto
    // loud-failure precedent: enforce the precondition in-plan.
    val guardedBucket = when(col(valueCol).isNotNull, bucket(col(valueCol)))
      .otherwise(raise_error(lit(
        s"PrefixScan: NULL in order column '$valueCol' — filter or impute upstream")))
    val wLocal = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((valueCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__pb", guardedBucket.cast("long"))
      .withColumn("__loc", sum(col(weightCol)).over(wLocal))
    // Bucket totals: same (group, bucket) clustering as wLocal, so no
    // second data shuffle; both windows below run over the tiny bucket
    // summary and share one partitioning.
    val wOff = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val totals = local.groupBy(keyCols.map(col): _*)
      .agg(sum(col(weightCol)).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
    val offsets = totalCol.fold(totals)(n =>
        totals.withColumn(n, sum(col("__bt")).over(wAll)))
      .select(keyCols.map(col) ++ (col("__off") +: totalCol.toSeq.map(col)): _*)
    // NULL-SAFE join on the group keys: groupBy and window functions
    // both treat NULL as an ordinary group, but a using-columns join is
    // null-unsafe — it would silently DROP every NULL-group row (the
    // valueCol guard's failure mode, wearing the group column). <=>
    // keeps the two semantics aligned; __pb itself is never null (the
    // valueCol guard raises first).
    val off = offsets.alias("__ps_off")
    val lhs = local.alias("__ps_loc")
    lhs.join(broadcast(off),
        keyCols.map(k => col(s"__ps_loc.$k") <=> col(s"__ps_off.$k")).reduce(_ && _))
      .select(local.columns.map(c => col(s"__ps_loc.$c")) ++
        (col("__ps_off.__off") +: totalCol.toSeq.map(n => col(s"__ps_off.$n"))): _*)
      .withColumn(cumCol, col("__off") + col("__loc"))
      .drop("__pb", "__loc", "__off")
  }
}
