package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables, Exact}
import Exact._

/** Composite multi-operator workload queries — the reference's analytics
  * entry point runs whole reports, not single operators (README.md:102-104),
  * so the engine must hold up when joins, aggregates, top-k and dimension
  * lookups compose into ONE plan that Catalyst has to order and broadcast
  * correctly. Shapes follow TPC-H Q3/Q10 (the canonical composites for this
  * schema); correctness rides the same Exact decimal discipline as q01.
  *
  * Scale posture (asserted in PlanSpec): the two fact tables join on
  * l_orderkey (their natural co-partition key), the customer dim arrives
  * through one compact-key shuffle, the nation dim broadcasts, and top-k
  * fuses into TakeOrderedAndProject — no global sort of the aggregate ever
  * materializes.
  */
object Workload {

  /** q97 — shipping-priority report (TPC-H Q3 shape): segment-filtered
    * customers' open orders ranked by outstanding revenue. Composes
    * P3 filters + J1/J2 joins + A1 aggregate + O3 top-k in one plan. */
  val q97 = Q(
    "q97_shipping_priority",
    (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter($"o_orderdate" < lit("1998-06-01").cast(TimestampType))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
      val li = Tables(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1998-06-01").cast(TimestampType))
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(toDbl(sum(money($"l_extendedprice") * oneMinus($"l_discount")))
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${sqlToDbl(s"SUM(${sqlMoney("l_extendedprice")} * ${sqlOneMinus("l_discount")})")} AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    doc = "TPC-H Q3 shape: P3 J1 J2 A1 O3 composed — filters push to scans, " +
      "top-k fuses, no global sort materializes")

  /** q98 — returned-revenue report (TPC-H Q10 shape): customers ranked
    * by revenue lost to returns in one quarter, with their nation name.
    * Adds a second dim hop (nation, broadcast) over q97's shape. */
  val q98 = Q(
    "q98_returned_revenue",
    (s, dir) => {
      import s.implicits._
      val ord = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1998-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-04-01").cast(TimestampType))
        .select($"o_orderkey", $"o_custkey")
      val li = Tables(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val cust = Tables(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
      val nat = Tables(s, dir, "nation")
        .select($"n_nationkey", $"n_name")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(toDbl(sum(money($"l_extendedprice") * oneMinus($"l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, n_name,
        ${sqlToDbl(s"SUM(${sqlMoney("l_extendedprice")} * ${sqlOneMinus("l_discount")})")} AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1998-01-01'
        AND o_orderdate < TIMESTAMP '1998-04-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    doc = "TPC-H Q10 shape: two fact joins + broadcast nation dim + top-k; " +
      "the dim hop must broadcast, never shuffle the aggregate")

  /** q99 — equi-width histogram (X28): the distribution-shape profile
    * X13's per-column profiler doesn't give. One aggregation pass;
    * bucket indices are EXACT integer math (2dp prices → cents →
    * integer div), never floor-of-double-division, which can land on a
    * bucket edge one ULP apart across engines. */
  val q99 = Q(
    "q99_histogram",
    (s, dir) => {
      import s.implicits._
      // cents div (5000 * 100): width-5000 buckets, exact in BIGINT.
      // Spark `/` on longs is DOUBLE division; floor+cast is still exact
      // here because cents < 2^53 and a double quotient's rounding error
      // (< 1 ulp) cannot cross an integer boundary 2e-6 away.
      val cents = (money($"l_extendedprice") * 100).cast(LongType)
      val bucket = floor(cents / lit(500000L)).cast(LongType)
      Tables(s, dir, "lineitem")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
        .select(($"bucket" * 5000L).as("lo_edge"), $"n", $"total")
        .orderBy($"lo_edge")
    },
    Some(s"""
      SELECT bucket * 5000 AS lo_edge, CAST(COUNT(*) AS BIGINT) AS n,
             ${sqlDsum("l_extendedprice")} AS total
      FROM (SELECT l_extendedprice,
              CAST(${sqlMoney("l_extendedprice")} * 100 AS BIGINT) // 500000 AS bucket
            FROM lineitem)
      GROUP BY bucket ORDER BY lo_edge"""),
    doc = "X28: equi-width histogram — exact cent-integer bucketing, one " +
      "aggregation pass, shuffle carries one row per bucket")

  /** q100 — SCD2 change intervals (X29): compress a per-entity event
    * stream into slowly-changing-dimension rows — keep only CHANGES of
    * the tracked value, each with its validity interval
    * [valid_from, valid_to) and an is_current flag. The warehouse
    * `MERGE`-history primitive. All window math over the entity
    * partition: one shuffle on user_id, no self-joins; value
    * comparisons are raw parquet doubles (no arithmetic), so both
    * engines compare identical bits. */
  val q100 = Q(
    "q100_scd2_intervals",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .filter($"prev_value".isNull || $"value" =!= $"prev_value")
        .withColumn("valid_to",
          lead($"ts", 1).over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .select($"user_id", $"value", $"ts".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"))
        .orderBy($"user_id", $"valid_from")
    },
    Some("""
      WITH src AS (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events WHERE event_type = 'purchase'),
      chg AS (
        SELECT user_id, ts, event_id, value,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM src WHERE prev_value IS NULL OR value <> prev_value)
      SELECT user_id, value, ts AS valid_from, valid_to,
             valid_to IS NULL AS is_current
      FROM chg ORDER BY user_id, valid_from"""),
    doc = "X29: SCD2 history build — change filter + validity intervals via " +
      "lag/lead over the entity partition; one shuffle, zero joins")

  /** q101 — incremental aggregate maintenance (X30): the summary is
    * built from a base batch and TWO successive delta refreshes via
    * [[graft.operators.IncrementalAgg]] — never from the full history —
    * while the oracle aggregates the full table in one pass. Equality
    * is exactly the incremental-view-maintenance contract. Sums ride
    * decimal (exact, order-independent) so merge order cannot show
    * through the doubles. */
  val q101 = Q(
    "q101_incremental_agg",
    (s, dir) => {
      import s.implicits._
      import graft.operators.IncrementalAgg
      val keys = Seq("o_orderstatus", "month")
      val facts = Tables(s, dir, "orders").select(
        $"o_orderstatus", date_trunc("month", $"o_orderdate").as("month"),
        money($"o_totalprice").as("price"))
      val cut1 = lit("1999-01-01").cast(TimestampType)
      val cut2 = lit("2000-01-01").cast(TimestampType)
      val base = IncrementalAgg.summarize(
        facts.filter($"month" < cut1), keys, Seq("price"))
      val s1 = IncrementalAgg.refresh(base,
        facts.filter($"month" >= cut1 && $"month" < cut2), keys, Seq("price"))
      val s2 = IncrementalAgg.refresh(s1,
        facts.filter($"month" >= cut2), keys, Seq("price"))
      s2.select($"o_orderstatus", $"month", $"n",
          toDbl($"sum_price").as("total"),
          toDbl($"min_price").as("lo"), toDbl($"max_price").as("hi"))
        .orderBy($"o_orderstatus", $"month")
    },
    Some(s"""
      SELECT o_orderstatus, date_trunc('month', o_orderdate) AS month,
             CAST(COUNT(*) AS BIGINT) AS n,
             ${sqlDsum("o_totalprice")} AS total,
             ${sqlToDbl(s"MIN(${sqlMoney("o_totalprice")})")} AS lo,
             ${sqlToDbl(s"MAX(${sqlMoney("o_totalprice")})")} AS hi
      FROM orders
      GROUP BY o_orderstatus, month
      ORDER BY o_orderstatus, month"""),
    doc = "X30: summary = base ⊕ delta ⊕ delta, oracle = full re-aggregate — " +
      "refresh cost is |delta| + |summary|, never |history|")

  /** q102 — last-touch attribution (X31): every purchase attributed to
    * the user's most recent click within a 7-day lookback. One window
    * pass over the entity partition (ROWS frame + ignoreNulls last) —
    * no self-join of the event stream against itself, which is the
    * naive formulation's scale killer. Deterministic under same-ts
    * events because the ROWS frame orders by (ts, event_id). */
  val q102 = Q(
    "q102_attribution",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("last_click_ts",
          last(when($"event_type" === "click", $"ts"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts".as("purchase_ts"),
          when($"last_click_ts" >= $"ts" - expr("INTERVAL 7 DAYS"), $"last_click_ts")
            .as("attributed_click_ts"))
        .withColumn("attributed", $"attributed_click_ts".isNotNull)
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        FROM events)
      SELECT user_id, event_id, ts AS purchase_ts,
             CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                  THEN last_click_ts END AS attributed_click_ts,
             (CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                   THEN last_click_ts END) IS NOT NULL AS attributed
      FROM ev WHERE event_type = 'purchase'
      ORDER BY user_id, event_id"""),
    doc = "X31: last-touch attribution — ignoreNulls last over a ROWS frame; " +
      "one shuffle on user_id, the event stream never self-joins")

  /** q105 — winsorized group means (X34): clamp each group's values at
    * its exact empirical P05/P95 before averaging — the outlier-robust
    * aggregation a metrics pipeline runs over heavy-tailed measures.
    * Boundaries are EXACT rank statistics (value at ceil(q·n), integer
    * rank math), not interpolated quantiles, so both engines pick the
    * same 2dp value bit-for-bit.
    *
    * Scale shape: the spelled-out form — row_number + boundary windows
    * PARTITION BY l_returnflag — is a 3-value partition key, one task
    * per flag at any cluster size (the r4-flagged skew family).
    * Instead the global row rank comes from [[graft.operators
    * .PrefixScan]] with weight 1 — one (flag, price-bucket) data
    * shuffle whose task count scales with the value domain, not the
    * flag count — the boundary values fall out of one aggregation over
    * the scan (min value whose rank clears each threshold), and a
    * 3-row boundary broadcast feeds the map-side-combinable final
    * mean. (At 100 TB the same shape runs with approx_percentile
    * boundaries — tolerance-checked A8 territory; the exact-rank form
    * is the oracle-able contract.) */
  val q105 = Q(
    "q105_winsorized_mean",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val li = Tables(s, dir, "lineitem")
        .select($"l_returnflag", $"l_extendedprice")
      // PrefixScan over raw rows with weight 1: the inclusive cum IS
      // row_number under the original (price, orderkey, linenumber)
      // ordering, so the boundary picks are literally "the value at
      // rank k" — one well-distributed (flag, bucket) data shuffle in
      // place of the 3-task flag sort. cum >= klo = ceil(5n/100) for
      // integer cum is exactly 100*cum >= 5n, so the boundaries fall
      // out of ONE aggregation with no precomputed klo/khi.
      val scanned = PrefixScan.inclusive(
        Tables(s, dir, "lineitem")
          .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
            $"l_linenumber", lit(1L).as("one")),
        Seq("l_returnflag"), "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), "one", _ / 2000d, "rk", Some("n"))
      val bounds = scanned
        .groupBy($"l_returnflag")
        .agg(min(when($"rk" * 100 >= $"n" * 5, $"l_extendedprice")).as("lo_v"),
          min(when($"rk" * 100 >= $"n" * 95, $"l_extendedprice")).as("hi_v"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          max($"lo_v").as("lo_v"), max($"hi_v").as("hi_v"),
          (toDbl(sum(money(least(greatest($"l_extendedprice", $"lo_v"), $"hi_v"))))
            / count(lit(1))).as("mean_w"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH r AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        FROM lineitem),
      b AS (
        SELECT l_returnflag, l_extendedprice, rn, cnt,
               (cnt * 5 + 99) // 100 AS klo, (cnt * 95 + 99) // 100 AS khi,
               MAX(CASE WHEN rn = (cnt * 5 + 99) // 100 THEN l_extendedprice END)
                 OVER (PARTITION BY l_returnflag) AS lo_v,
               MAX(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN l_extendedprice END)
                 OVER (PARTITION BY l_returnflag) AS hi_v
        FROM r)
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(lo_v) AS lo_v, MAX(hi_v) AS hi_v,
             ${sqlToDbl(s"SUM(${sqlMoney("least(greatest(l_extendedprice, lo_v), hi_v)")})")} / COUNT(*) AS mean_w
      FROM b GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "X34: winsorized mean — exact rank-statistic clamp boundaries from " +
      "a PrefixScan'd distinct-price summary; the fact table never shuffles")

  /** q110 — incremental DISTINCT maintenance (X30b): per-month distinct
    * customers kept fresh across two delta refreshes via HLL sketches
    * ([[graft.operators.IncrementalAgg.summarizeDistinct]]) — exact
    * distinct is not mergeable, the sketch's register-wise max is, and
    * the merged sketch is BIT-EQUAL to a full rebuild (ExtendedSpec).
    * No DuckDB oracle: DataSketches HLL isn't reproducible there — the
    * q24/A4 tolerance precedent; the driver records the rows-only
    * check and ScalaTest pins the math. */
  val q110 = Q(
    "q110_incremental_distinct",
    (s, dir) => {
      import s.implicits._
      import graft.operators.IncrementalAgg
      val keys = Seq("month")
      val facts = Tables(s, dir, "orders").select(
        date_trunc("month", $"o_orderdate").as("month"), $"o_custkey")
      val cut1 = lit("1999-01-01").cast(TimestampType)
      val cut2 = lit("2000-01-01").cast(TimestampType)
      val base = IncrementalAgg.summarizeDistinct(
        facts.filter($"month" < cut1), keys, "o_custkey")
      val s1 = IncrementalAgg.mergeDistinct(base,
        IncrementalAgg.summarizeDistinct(
          facts.filter($"month" >= cut1 && $"month" < cut2), keys, "o_custkey"), keys)
      val s2 = IncrementalAgg.mergeDistinct(s1,
        IncrementalAgg.summarizeDistinct(
          facts.filter($"month" >= cut2), keys, "o_custkey"), keys)
      IncrementalAgg.estimateDistinct(s2, keys).orderBy($"month")
    },
    None,
    doc = "X30b: distinct-count maintenance via mergeable HLL sketches — " +
      "incremental merge bit-equals the full rebuild; tolerance-checked in " +
      "ScalaTest (no engine-portable oracle for DataSketches registers)")

  /** q112 — MERGE INTO snapshot maintenance (X38): one deterministic
    * change batch (updates for custkey%10=3, deletes for %10=7,
    * inserts at +1000000 for %10=0) applied to the customer snapshot
    * via [[graft.operators.MergeInto]] — one full-outer join, partial-
    * column update, delete flags honored, inserts carry nulls for
    * columns the batch doesn't provide. Money math rides Exact
    * decimals so updated balances hash-match. */
  val q112 = Q(
    "q112_merge_into",
    (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val updates = cust.filter($"c_custkey" % 10 === 3)
        .select($"c_custkey",
          toDbl(money($"c_acctbal") + 100).as("c_acctbal"),
          lit(false).as("__del"))
      val deletes = cust.filter($"c_custkey" % 10 === 7)
        .select($"c_custkey", lit(null).cast("double").as("c_acctbal"),
          lit(true).as("__del"))
      val inserts = cust.filter($"c_custkey" % 10 === 0)
        .select(($"c_custkey" + 1000000L).as("c_custkey"),
          lit(500.0).as("c_acctbal"), lit(false).as("__del"))
      val source = updates.unionByName(deletes).unionByName(inserts)
      graft.operators.MergeInto
        .merge(cust, source, Seq("c_custkey"), Seq("c_acctbal"),
          deleteCol = Some("__del"))
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some(s"""
      WITH src AS (
        SELECT c_custkey, ${sqlToDbl(s"${sqlMoney("c_acctbal")} + 100")} AS c_acctbal,
               FALSE AS del
        FROM customer WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT c_custkey, NULL, TRUE FROM customer WHERE c_custkey % 10 = 7
        UNION ALL
        SELECT c_custkey + 1000000, 500.0, FALSE
        FROM customer WHERE c_custkey % 10 = 0),
      m AS (SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
              t.c_name,
              COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
              t.c_mktsegment,
              COALESCE(s.del, FALSE) AS del
            FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey)
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      FROM m WHERE NOT del ORDER BY c_custkey"""),
    doc = "X38: MERGE INTO — full-outer join + per-column resolution; " +
      "updates, deletes and inserts in one shuffle per side")

  /** q139 — incremental EXACT quantile maintenance (X50): per-status
    * P50/P95 of order value kept fresh across two delta refreshes.
    * Exact quantiles are not mergeable as scalars, but the per-key
    * VALUE HISTOGRAM is (counts add), and over the 2dp money domain it
    * is value-domain-sized; quantiles read out as exact rank
    * statistics via [[graft.operators.PrefixScan]] (q105's boundary
    * device). Unlike KLL/t-digest (randomized compaction, merges not
    * bit-reproducible), base ⊕ delta IS the full-rebuild histogram, so
    * the maintained quantiles hash-match the full-table DuckDB rank
    * statistic — the oracle never sees the refresh structure at all.
    * Scale shape: each refresh aggregates only its delta (map-side
    * combinable) and merges summaries sized by distinct values, never
    * re-scanning history; the readout is one metadata-sized scan. */
  val q139 = Q(
    "q139_incremental_quantiles",
    (s, dir) => {
      import s.implicits._
      import graft.operators.IncrementalAgg
      val keys = Seq("o_orderstatus")
      val facts = Tables(s, dir, "orders")
        .select($"o_orderstatus", $"o_totalprice", $"o_orderdate")
      val cut1 = lit("1996-01-01").cast(TimestampType)
      val cut2 = lit("1997-06-01").cast(TimestampType)
      val base = IncrementalAgg.summarizeHist(
        facts.filter($"o_orderdate" < cut1), keys, "o_totalprice")
      val h1 = IncrementalAgg.mergeHist(base,
        IncrementalAgg.summarizeHist(
          facts.filter($"o_orderdate" >= cut1 && $"o_orderdate" < cut2),
          keys, "o_totalprice"), keys, "o_totalprice")
      val h2 = IncrementalAgg.mergeHist(h1,
        IncrementalAgg.summarizeHist(
          facts.filter($"o_orderdate" >= cut2), keys, "o_totalprice"),
        keys, "o_totalprice")
      IncrementalAgg.histQuantiles(h2, keys, "o_totalprice", _ / 10000d,
          Seq("p50" -> 50, "p95" -> 95))
        .orderBy($"o_orderstatus")
    },
    Some("""
      WITH r AS (
        SELECT o_orderstatus, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        FROM orders)
      SELECT o_orderstatus,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_values,
             MAX(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN o_totalprice END) AS p50,
             MAX(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN o_totalprice END) AS p95
      FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    doc = "X50: incremental exact quantile maintenance — mergeable value " +
      "histogram + PrefixScan rank statistics; base+delta merges hash-match " +
      "the full-table oracle exactly (no sketch tolerance)")

  val all: Seq[Q] = Seq(q97, q98, q99, q100, q101, q102, q105, q110, q112, q139)
}
