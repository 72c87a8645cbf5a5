package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.5 — window functions (W1-W5) + the batch sessionization
  * idiom (Q25 / T4's batch twin).
  *
  * Scale posture: a window = one shuffle on partitionBy keys + an
  * in-partition sort. All windows here partition on high-cardinality keys
  * (custkey / user_id / mktsegment), so per-partition state stays small;
  * rank-based dedup/top-k never materializes the full sorted table the
  * way orderBy().limit() per group via collect would.
  *
  * Determinism: rank/dense_rank depend only on the order-key VALUES (safe
  * under ties); row_number/ntile additionally need a unique tiebreak in
  * the ORDER BY — every such window here ends in a unique id column.
  */
object Windows {

  /** q25 — ranking family: row_number, rank, dense_rank, ntile (W1).
    *
    * De-skewed (r5 audit): `PARTITION BY o_orderstatus` is a 3-value
    * key — one task per status at any cluster size. All four rank
    * functions decompose over [[graft.operators.PrefixScan]]:
    * row_number is the weight-1 scan over raw rows; rank is the
    * strict-prefix row count of the order-DAY summary + 1; dense_rank
    * is the day's position among distinct days (a weight-1 scan of the
    * same summary); ntile(4) is pure integer math on (row_number, n) —
    * SQL-standard big-buckets-first: with b = n div 4, r = n mod 4,
    * the first r tiles take b+1 rows. Shuffles: one well-distributed
    * (status, quarter-bucket) data shuffle + one day-summary aggregate
    * + a broadcast of the ~2.5k-day summary — same volume as the
    * single skewed window, minus the 3-task cap. */
  val q25 = Q(
    "q25_ranking",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val bucket = (c: org.apache.spark.sql.Column) =>
        datediff(c, lit("1992-01-01").cast("date")) / 90
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
          to_date($"o_orderdate").as("day"), lit(1L).as("one"))
      val scanned = PrefixScan.inclusive(base, Seq("o_orderstatus"), "day",
        Seq("o_orderkey"), "one", bucket, "rn", Some("n"))
      val summary = scanned.groupBy($"o_orderstatus", $"day")
        .agg(count(lit(1)).as("cnt"))
      val ranks = PrefixScan.inclusive(summary, Seq("o_orderstatus"), "day",
          Nil, "cnt", bucket, "cum_le")
        .withColumn("rnk", $"cum_le" - $"cnt" + 1)
        .withColumn("uno", lit(1L))
      val dense = PrefixScan.inclusive(ranks, Seq("o_orderstatus"), "day",
          Nil, "uno", bucket, "drnk")
        .select($"o_orderstatus", $"day", $"rnk", $"drnk")
      scanned.join(broadcast(dense), Seq("o_orderstatus", "day"))
        .withColumn("b", expr("n div 4")).withColumn("r", expr("n % 4"))
        .select($"o_orderkey", $"o_orderstatus",
          $"rnk".cast("int").as("rnk"), $"drnk".cast("int").as("drnk"),
          $"rn".cast("int").as("rn"),
          expr("CAST(CASE WHEN rn <= r * (b + 1) THEN (rn + b) div (b + 1) " +
            "ELSE r + (rn - r * (b + 1) + b - 1) div b END AS INT)").as("quartile"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderstatus,
        rank() OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)) AS rnk,
        dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_orderdate AS DATE)) AS drnk,
        row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn,
        ntile(4) OVER (PARTITION BY o_orderstatus
                       ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS quartile
      FROM orders ORDER BY o_orderkey"""),
    doc = "W1: all four rank functions from one PrefixScan data shuffle + " +
      "a day-summary broadcast (no one-task-per-status window)")

  /** q26 — lag / lead over per-user event streams (W2). */
  val q26 = Q(
    "q26_lag_lead",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          lag($"event_type", 1).over(w).as("prev_type"),
          lead($"event_type", 1).over(w).as("next_type"),
          (unix_timestamp($"ts") - unix_timestamp(lag($"ts", 1).over(w)))
            .as("secs_since_prev"))
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id, event_type,
        lag(event_type, 1) OVER w AS prev_type,
        lead(event_type, 1) OVER w AS next_type,
        CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS secs_since_prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""),
    doc = "W2: lag/lead share one window; basis for sessionization (q30)")

  /** q27 — frame aggregates: running ROWS sum + value-RANGE count (W3).
    *
    * The running total partitions on o_custkey — high cardinality,
    * scales with the cluster. The RANGE band (`PARTITION BY
    * o_orderstatus RANGE 10000 PRECEDING`) is the r4-flagged 3-value
    * skew key, so it is decomposed instead of windowed: frame
    * membership depends only on VALUES, so count-in-band(p) =
    * count(v ≤ p) − count(v < p−10000), two reads of the cumulative
    * distribution of the distinct-price summary. Both reads ride one
    * [[graft.operators.PrefixScan]]: data rows carry their value
    * count, and a zero-weight "query row" pinned at each band's lower
    * boundary p−10000 — tie-ordered BEFORE equal-valued data rows —
    * reads the strict prefix count(v < p−10000) as its inclusive
    * cumulative. The p−10000 subtraction is the same IEEE double op
    * the RANGE frame evaluates, so boundary placement is bit-identical
    * to the window form. Shuffles: distinct-price summary aggregate +
    * the custkey window + one well-distributed (status, price) join —
    * no 3-task window anywhere. */
  val q27 = Q(
    "q27_frames",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val running = Window.partitionBy($"o_custkey")
        .orderBy(to_date($"o_orderdate"), $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val orders = Tables(s, dir, "orders")
      val summary = orders.groupBy($"o_orderstatus", $"o_totalprice")
        .agg(count(lit(1)).as("cnt"))
      val pts = summary.select($"o_orderstatus", $"o_totalprice".as("v"),
          lit(1).as("ord"), $"cnt".as("w"), $"o_totalprice".as("p"))
        .unionByName(summary.select($"o_orderstatus",
          ($"o_totalprice" - 10000d).as("v"), lit(0).as("ord"),
          lit(0L).as("w"), $"o_totalprice".as("p")))
      val scanned = PrefixScan.inclusive(pts, Seq("o_orderstatus"), "v",
        Seq("ord"), "w", _ / 10000d, "cum")
      val band = scanned.groupBy($"o_orderstatus", $"p")
        .agg((max(when($"ord" === 1, $"cum"))
          - max(when($"ord" === 0, $"cum"))).as("n_in_band"))
        .withColumnRenamed("p", "o_totalprice")
      orders
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
          toDbl(sum(money($"o_totalprice")).over(running)).as("run_total"))
        .join(band, Seq("o_orderstatus", "o_totalprice"))
        .select($"o_orderkey", $"o_custkey", $"run_total", $"n_in_band")
        .orderBy($"o_orderkey")
    },
    Some(s"""
      SELECT o_orderkey, o_custkey,
        ${sqlToDbl(s"SUM(${sqlMoney("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_total,
        COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                       RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
      FROM orders ORDER BY o_orderkey"""),
    doc = "W3: ROWS running total (exact decimal) + RANGE value band via " +
      "PrefixScan query rows (no 3-task status window)")

  /** q28 — first/last over the full partition frame (W4). */
  val q28 = Q(
    "q28_first_last",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // Window then same-key aggregate: the groupBy(user_id) reuses the
      // window's hash(user_id) partitioning, so the whole query is ONE
      // shuffle — no second scan, no join, no distinct. first() in the
      // agg is value-deterministic because the window made the column
      // constant per user.
      Tables(s, dir, "events")
        .select($"user_id",
          first($"event_type").over(w).as("first_type"),
          last($"event_type").over(w).as("last_type"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          first($"first_type").as("first_type"),
          first($"last_type").as("last_type"))
        .orderBy($"user_id")
    },
    Some("""
      WITH fl AS (
        SELECT DISTINCT user_id,
          first_value(event_type) OVER w AS first_type,
          last_value(event_type) OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT n.user_id AS user_id, n.n AS n, fl.first_type, fl.last_type
      FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) n
      JOIN fl ON n.user_id = fl.user_id
      ORDER BY user_id"""),
    doc = "W4: first/last over explicit full-partition frame (default frame stops at current row)")

  /** q29 — top-k per group via the rank-filter idiom (W5): top 3 orders
    * by value per market segment. */
  val q29 = Q(
    "q29_topk_per_group",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      // Two-phase (salted) top-k: a window over only |segments| keys
      // caps parallelism at 5 reducers no matter the cluster — the
      // 100 TB killer. Phase 1 ranks within (segment, salt) [160 keys,
      // fully parallel] and keeps k per bucket; phase 2 ranks the
      // <= segments*salts*k survivors. Global top-k rows are top-k
      // within their salt bucket, so the result is identical.
      val salts = 32
      val salted = Window.partitionBy($"c_mktsegment", $"__salt")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice",
          pmod(hash($"o_orderkey"), lit(salts)).as("__salt"))
        .withColumn("srn", row_number().over(salted))
        .filter($"srn" <= 3)
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice",
          row_number().over(w).as("rn"))
        .filter($"rn" <= 3)
        .orderBy($"c_mktsegment", $"rn")
    },
    Some("""
      SELECT * FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rn <= 3 ORDER BY c_mktsegment, rn"""),
    doc = "W5: row_number<=k — the distributed top-k-per-group; no per-group collect")

  /** q30 — batch sessionization (lag + gap-flag + running sum = session
    * id), 30-minute gap. The batch twin of T4's session_window. */
  val q30 = Q(
    "q30_sessionize",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("gap",
          when(unix_timestamp($"ts") - unix_timestamp(lag($"ts", 1).over(w)) > 1800L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"gap").over(cum))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"), max($"ts").as("session_end"))
        .orderBy($"user_id", $"session_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
          CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) -
                    CAST(floor(epoch(lag(ts,1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
               THEN 1 ELSE 0 END AS gap
        FROM events),
      s AS (
        SELECT user_id, ts, event_id,
          CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM g)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    doc = "Q25/T4 batch twin: gap>30min starts a session; one shuffle + one agg")

  /** q138 — GLOBAL running revenue (W9): each order's cumulative
    * revenue position in the (date, orderkey) total order across the
    * WHOLE table — `SUM(...) OVER (ORDER BY day, key)` with no
    * partition at all, the degenerate window Spark executes as a
    * single-task global sort no matter the cluster ("Moving all data
    * to a single partition"). [[graft.operators.PrefixScan]] with an
    * EMPTY group is exactly this computation distributed: quarterly
    * date buckets shard the sort, bucket subtotal offsets broadcast
    * back, and the money stays exact DECIMAL through the cumulative
    * sum (q27's run_total device, globally). The de-skew flagship:
    * the one-task window family's worst case, oracle-hash-identical. */
  val q138 = Q(
    "q138_global_running_revenue",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val bucket = (c: org.apache.spark.sql.Column) =>
        datediff(c, lit("1992-01-01").cast("date")) / 90
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey", to_date($"o_orderdate").as("day"),
          money($"o_totalprice").as("rev"))
      PrefixScan.inclusive(base, Nil, "day", Seq("o_orderkey"), "rev",
          bucket, "cum")
        .select($"o_orderkey", $"day", toDbl($"cum").as("run_revenue"))
        .orderBy($"o_orderkey")
    },
    Some(s"""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
        ${sqlToDbl(s"SUM(${sqlMoney("o_totalprice")}) OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS run_revenue
      FROM orders ORDER BY o_orderkey"""),
    doc = "W9: unpartitioned global running sum via empty-group PrefixScan — " +
      "no single-task global sort; exact DECIMAL money")

  val all: Seq[Q] = Seq(q25, q26, q27, q28, q29, q30, q138)
}
