package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** Behavioral analytics over the event stream (SURVEY.md §2.11a
  * X24/X25): ordered-funnel completion and cohort retention — the two
  * queries every product-analytics workload runs at fact-table scale.
  */
object Analytics {

  /** q89 — ordered funnel (X24): how many users progressed through
    * view → click → purchase IN ORDER (strictly increasing event time).
    * Greedy earliest-completion equals stage reachability, so the
    * funnel is exactly a conditional-min chain: t1 = earliest view,
    * t2 = earliest click strictly after t1, t3 = earliest purchase
    * strictly after t2 — K-1 chained `min(when(...)).over(user)`
    * windows sharing ONE partitioning (one exchange, sort reused),
    * then a same-key rollup that Catalyst plans with no extra shuffle.
    * Scale posture (the r7-verdict fix): the previous form built a
    * per-user `collect_list` event array — a bot user with 10⁸ events
    * was one monster row in one task. The window form holds O(1)
    * computed state per row and buffers partitions in Spark's
    * spill-safe window buffer, so a hot user costs disk, not a
    * single-row OOM; FunnelSpec pins the plan array-free. The oracle
    * reaches the same counts via the classic min-timestamp join chain
    * (K passes over the fact table; the window form is one pass). */
  val q89 = Q(
    "q89_funnel",
    (s, dir) => funnelCounts(Tables(s, dir, "events")),
    Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase"""),
    doc = "X24: ordered funnel via chained conditional-min windows — one " +
      "pass, one shuffle, no per-user array; oracle = the K-pass " +
      "min-timestamp join chain")

  /** The q89 funnel body, factored out so FunnelSpec can drive it with
    * a planted bot-user frame (one user, many interleaved events) and
    * pin both the counts and the array-free plan shape. Input needs
    * `user_id`, `ts`, `event_type` columns. */
  def funnelCounts(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val perUser = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
    perUser.agg(
      sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_click"),
      sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
  }

  /** q90 — cohort retention (X25): users grouped by first-seen week,
    * distinct-user activity per (cohort, week offset). Two shuffles
    * total (first-seen agg, cohort-offset distinct count); the
    * first-seen frame is keys+week only, broadcastable at dim scale.
    * Weeks via date_trunc('week') — Monday-start in both engines — and
    * the offset divides an exact day multiple, so no calendar drift. */
  val q90 = Q(
    "q90_cohort_retention",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"user_id", date_trunc("week", $"ts").as("wk"))
      val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
      ev.join(cohort, "user_id")
        .groupBy($"cohort_wk",
          (datediff($"wk", $"cohort_wk") / 7).cast("long").as("wk_offset"))
        .agg(countDistinct($"user_id").as("active_users"))
        .orderBy($"cohort_wk", $"wk_offset")
    },
    Some("""
      WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1)
      SELECT c.cohort_wk,
             CAST(date_diff('day', c.cohort_wk, e.wk) / 7 AS BIGINT) AS wk_offset,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
      FROM ev e JOIN cohort c ON e.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    doc = "X25: cohort retention — first-seen week x activity-week offset, " +
      "distinct actives; two compact-key shuffles")

  /** q94 — per-key linear trend (X27): closed-form OLS slope of value
    * over time for each user, in ONE aggregation pass — the "fit a
    * line per key" primitive behind drift detection and trend scoring,
    * with no per-key iteration anywhere. Numeric discipline (the whole
    * trick at any scale): x = whole seconds since the user's first
    * event, y = exact cents, so Σx, Σy, Σxy, Σx² are exact BIGINTs in
    * any summation order; the final slope combines those longs in
    * IEEE double via the TEXTUALLY identical formula in both engines.
    * Σxy stays under 2^63 because x is centered per key — raw epoch
    * seconds would overflow; centering is the load-bearing step. */
  val q94 = Q(
    "q94_group_trend",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
      val base = Tables(s, dir, "events")
        .filter($"user_id" < 50)
        .select($"user_id",
          (unix_timestamp($"ts") - unix_timestamp(min($"ts").over(w))).as("x"),
          (($"value").cast(graft.core.Exact.Money) * 100).cast("long").as("y"))
      base.groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
        .select($"user_id", $"n",
          (($"n".cast("double") * $"sxy".cast("double") -
            $"sx".cast("double") * $"sy".cast("double")) /
            nullif($"n".cast("double") * $"sxx".cast("double") -
              $"sx".cast("double") * $"sx".cast("double"), lit(0.0)))
            .as("slope_cents_per_sec"))
        .orderBy($"user_id")
    },
    Some("""
      WITH base AS (
        SELECT user_id,
               date_diff('second', MIN(ts) OVER (PARTITION BY user_id), ts) AS x,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM events WHERE user_id < 50),
      s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM base GROUP BY user_id)
      SELECT user_id, n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope_cents_per_sec
      FROM s ORDER BY user_id"""),
    doc = "X27: one-pass closed-form OLS per key — exact integer sums " +
      "(centered x prevents overflow), identical IEEE combine both engines")

  /** q104 — event-transition matrix (X33): per-user next-event pairs
    * (Markov transition counts + row-normalized probabilities), the
    * sequence-feature primitive behind next-action models and
    * anomaly scoring. One window pass over the user partition for the
    * `lead`, one compact aggregation over (from, to) — the event
    * stream is never self-joined. The probability is a single IEEE
    * divide of two exact BIGINTs, identical in both engines. */
  val q104 = Q(
    "q104_transitions",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val counts = Tables(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("p", $"n".cast("double") /
          sum($"n").over(Window.partitionBy($"from_type")).cast("double"))
        .orderBy($"from_type", $"to_type")
    },
    Some("""
      WITH t AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             CAST(n AS DOUBLE) /
               CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      FROM c ORDER BY from_type, to_type"""),
    doc = "X33: Markov transition counts + probabilities — lead window, " +
      "compact (from,to) aggregate, one exact IEEE divide; no self-join")

  /** q108 — triangle participation (X35): co-purchase graph (users
    * purchasing in the same hour, capped to user_id < 100 so graph
    * density is scale-stable) → per-user triangle counts via the
    * degree-ordered forward algorithm ([[graft.operators.Triangles]]).
    * The oracle mirrors the orientation/wedge/closure steps; the
    * operator's equality with the naive 3-join count is additionally
    * ScalaTest-pinned on random graphs. */
  val q108 = Q(
    "q108_triangles",
    (s, dir) => {
      import s.implicits._
      val hp = Tables(s, dir, "events")
        .filter($"event_type" === "purchase" && $"user_id" < 100)
        .select(date_trunc("hour", $"ts").as("h"), $"user_id")
        .distinct()
      val edges = hp.as("a").join(hp.as("b"),
          $"a.h" === $"b.h" && $"a.user_id" < $"b.user_id")
        .select($"a.user_id".as("u"), $"b.user_id".as("v"))
        .distinct()
      graft.operators.Triangles.participation(edges, "u", "v")
        .select($"node".as("user_id"), $"n_triangles")
        .orderBy($"user_id")
    },
    Some("""
      WITH hp AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
                  WHERE event_type = 'purchase' AND user_id < 100),
      e AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
            FROM hp a JOIN hp b ON a.h = b.h AND a.user_id < b.user_id),
      deg AS (SELECT node, COUNT(*) AS d FROM
                (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY node),
      o AS (SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS s,
                   CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS t,
                   CASE WHEN (da.d, e.u) < (db.d, e.v) THEN db.d ELSE da.d END AS td
            FROM e JOIN deg da ON e.u = da.node JOIN deg db ON e.v = db.node),
      tri AS (SELECT o1.s AS s, o1.t AS w1, o2.t AS w2
              FROM o o1 JOIN o o2 ON o1.s = o2.s AND (o1.td, o1.t) < (o2.td, o2.t)
              JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t),
      corners AS (SELECT s AS node FROM tri UNION ALL SELECT w1 FROM tri
                  UNION ALL SELECT w2 FROM tri)
      SELECT node AS user_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM corners GROUP BY node ORDER BY user_id"""),
    doc = "X35: degree-ordered triangle counting — wedge fan-out bounded by " +
      "the lower-degree endpoint (O(E^1.5) total), every shuffle a compact " +
      "equi-join; oracle mirrors orientation/wedge/closure step for step")

  /** Unrolled integer-PageRank iteration CTE: i{k} from i{k-1}. */
  private def prIter(k: Int): String = {
    val prev = if (k == 1) "r0" else s"i${k - 1}"
    s"""i$k AS (
      SELECT nd.node,
        CAST((SELECT (1000000000000 * 15 // 100) // COUNT(*) FROM nodes) +
        (COALESCE(s.s, 0) * 85) // 100 AS BIGINT) AS r
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, CAST(SUM(r.r // od.od) AS BIGINT) AS s
        FROM e JOIN od ON e.src = od.src JOIN $prev r ON r.node = e.src
        GROUP BY e.dst) s ON s.dst = nd.node)"""
  }

  /** q109 — integer-exact PageRank (X36): 5 rounds over the symmetrized
    * co-purchase graph, all arithmetic in micro-rank longs with
    * integral division (see [[graft.operators.PageRank]]) — the fixed
    * point of the usual iterative-double formulation depends on
    * summation order and can never hash-match across engines; this one
    * matches bit for bit. */
  val q109 = Q(
    "q109_pagerank",
    (s, dir) => {
      import s.implicits._
      val hp = Tables(s, dir, "events")
        .filter($"event_type" === "purchase" && $"user_id" < 100)
        .select(date_trunc("hour", $"ts").as("h"), $"user_id")
        .distinct()
      val nodes = hp.select($"user_id").distinct()
      val e0 = hp.as("a").join(hp.as("b"),
          $"a.h" === $"b.h" && $"a.user_id" < $"b.user_id")
        .select($"a.user_id".as("u"), $"b.user_id".as("v"))
        .distinct()
      val sym = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
      graft.operators.PageRank
        .ranksMicro(nodes, "user_id", sym, "u", "v", iters = 5)
        .orderBy($"user_id")
    },
    Some(s"""
      WITH hp AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
                  WHERE event_type = 'purchase' AND user_id < 100),
      nodes AS (SELECT DISTINCT user_id AS node FROM hp),
      e0 AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
             FROM hp a JOIN hp b ON a.h = b.h AND a.user_id < b.user_id),
      e AS (SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0),
      od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
      r0 AS (SELECT node, (SELECT 1000000000000 // COUNT(*) FROM nodes) AS r
             FROM nodes),
      ${(1 to 5).map(prIter).mkString(",\n      ")}
      SELECT node AS user_id, r AS rank_micro FROM i5 ORDER BY user_id"""),
    doc = "X36: PageRank in exact micro-rank integer arithmetic — 5 rounds " +
      "hash-match across engines; double formulations never can")

  /** q111 — chi-square contingency scoring (X37): event type × hour of
    * day — the independence test behind feature selection and
    * seasonality detection. All counts and marginals are exact BIGINTs
    * (one aggregation + three window sums over the tiny cell grid);
    * expected counts and per-cell contributions are short deterministic
    * IEEE chains (one divide, one subtract, one multiply, one divide —
    * explicit multiply, never pow), so every cell hash-matches. The
    * per-cell rows ARE the deliverable (which cells drive dependence);
    * a global chi² is one ordered fold away. */
  val q111 = Q(
    "q111_chisq",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cells = Tables(s, dir, "events")
        .groupBy($"event_type", hour($"ts").as("hr"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy($"event_type")
      val wc = Window.partitionBy($"hr")
      val wa = Window.partitionBy()
      cells
        .withColumn("ri", sum($"o").over(wr))
        .withColumn("cj", sum($"o").over(wc))
        .withColumn("n", sum($"o").over(wa))
        .withColumn("expected",
          ($"ri" * $"cj").cast("double") / $"n".cast("double"))
        .withColumn("contrib",
          ($"o".cast("double") - $"expected") * ($"o".cast("double") - $"expected")
            / $"expected")
        .select($"event_type", $"hr", $"o", $"expected", $"contrib")
        .orderBy($"event_type", $"hr")
    },
    Some("""
      WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, hr, o,
              SUM(o) OVER (PARTITION BY event_type) AS ri,
              SUM(o) OVER (PARTITION BY hr) AS cj,
              SUM(o) OVER () AS n
            FROM cells)
      SELECT event_type, hr, o,
             CAST(ri * cj AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
             (CAST(o AS DOUBLE) - CAST(ri * cj AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE) - CAST(ri * cj AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(ri * cj AS DOUBLE) / CAST(n AS DOUBLE)) AS contrib
      FROM m ORDER BY event_type, hr"""),
    doc = "X37: chi-square cells — exact integer marginals via window sums, " +
      "deterministic IEEE per-cell scoring; hash-exact across engines")

  /** q113 — user survival curve (X39): fraction of users still active
    * d days after their first event, for d in 0..30 — the lifetime
    * distribution behind churn models (q90's cohort retention measures
    * week-bucketed ACTIVITY; this measures LIFETIME). Computed from
    * the bounded lifetime histogram, not a per-user spine: survivors
    * at d = total − (users whose lifetime ended before d), an
    * exclusive prefix sum over the 31-row day grid — the whole curve
    * costs one user aggregate plus window math over a tiny frame at
    * any corpus size. Fractions are one IEEE divide of exact longs. */
  val q113 = Q(
    "q113_survival",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val lif = Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(datediff(max($"ts"), min($"ts")).as("ld"))
      val hist = lif.groupBy($"ld").agg(count(lit(1)).as("c"))
      val total = lif.agg(count(lit(1)).as("total"))
      val spine = s.range(0, 31).select($"id".cast("int").as("d"))
      val wPrefix = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, -1)
      spine
        .join(hist, $"d" === $"ld", "left")
        .crossJoin(broadcast(total))
        .withColumn("died_before", coalesce(sum($"c").over(wPrefix), lit(0L)))
        .select($"d", ($"total" - $"died_before").as("surviving"),
          (($"total" - $"died_before").cast("double") / $"total".cast("double"))
            .as("frac"))
        .orderBy($"d")
    },
    Some("""
      WITH lif AS (SELECT user_id, date_diff('day', MIN(ts), MAX(ts)) AS ld
                   FROM events GROUP BY user_id),
      hist AS (SELECT ld, CAST(COUNT(*) AS BIGINT) AS c FROM lif GROUP BY ld),
      spine AS (SELECT CAST(unnest(range(0, 31)) AS INT) AS d),
      j AS (SELECT spine.d, hist.c,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM lif) AS total
            FROM spine LEFT JOIN hist ON spine.d = hist.ld),
      p AS (SELECT d, total,
              COALESCE(CAST(SUM(c) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                AS died_before
            FROM j)
      SELECT d, total - died_before AS surviving,
             CAST(total - died_before AS DOUBLE) / CAST(total AS DOUBLE) AS frac
      FROM p ORDER BY d"""),
    doc = "X39: survival curve from the lifetime histogram — exclusive " +
      "prefix sum over a 31-row grid; one user aggregate at any scale")

  /** q204 — declarative data-quality audit (X90): the Deequ-style
    * constraint suite a platform runs before publishing a table
    * (Schelter et al. VLDB '18) — one row per constraint with the
    * violation count and a pass verdict, so the report itself is the
    * gate's evidence. Constraints audited here: row-count floor,
    * primary-key uniqueness (orders, and composite lineitem
    * (orderkey, linenumber)), referential integrity orders→customer
    * and lineitem→orders, accepted values for l_returnflag, and the
    * l_quantity [1, 50] range.
    *
    * Scale: every completeness/uniqueness/range check is ONE map-side-
    * combined aggregate over its table; uniqueness counts dup KEYS via
    * a key-only aggregate (never materializing groups); referential
    * checks are id-only LEFT ANTI joins (payloads never move). The
    * whole report is a union of constraint-sized rows. */
  /** The q204 constraint suite over (lineitem, orders, customer)-shaped
    * frames — factored so DqAuditSpec can plant dup keys, orphan FKs
    * and out-of-range rows and watch each constraint fire. On the
    * driver corpus the composite lineitem key is GENUINELY non-unique
    * (the synthetic generator reuses (orderkey, linenumber)), so the
    * oracle row exercises a real detected violation, not an all-green
    * trivial report. */
  def dqReport(li: org.apache.spark.sql.DataFrame,
               ord: org.apache.spark.sql.DataFrame,
               cust: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      def row(name: String, violations: org.apache.spark.sql.DataFrame) =
        violations.select(lit(name).as("dq_check"),
          col("v").cast("long").as("violations"),
          (col("v") === 0).cast("int").as("passed"))
      val checks = Seq(
        row("lineitem_nonempty",
          li.agg(count(lit(1)).as("n")).select((col("n") === 0).cast("long").as("v"))),
        row("orders_pk_unique",
          ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
            .agg(count(when(col("c") > 1, 1)).as("v"))),
        row("lineitem_pk_unique",
          li.groupBy(col("l_orderkey"), col("l_linenumber")).agg(count(lit(1)).as("c"))
            .agg(count(when(col("c") > 1, 1)).as("v"))),
        row("orders_fk_customer",
          ord.select(col("o_custkey"))
            .join(cust.select(col("c_custkey")), col("o_custkey") === col("c_custkey"),
              "left_anti")
            .agg(count(lit(1)).as("v"))),
        row("lineitem_fk_orders",
          li.select(col("l_orderkey"))
            .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"),
              "left_anti")
            .agg(count(lit(1)).as("v"))),
        row("returnflag_accepted",
          li.agg(count(when(!col("l_returnflag").isin("A", "N", "R"), 1)).as("v"))),
        row("quantity_in_range",
          li.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("v"))))
      checks.reduce(_ unionByName _).orderBy(col("dq_check"))
  }

  val q204 = Q(
    "q204_dq_audit",
    (s, dir) => dqReport(Tables(s, dir, "lineitem"),
      Tables(s, dir, "orders"), Tables(s, dir, "customer")),
    Some("""
      SELECT dq_check, CAST(violations AS BIGINT) AS violations,
             CAST(violations = 0 AS INT) AS passed FROM (
        SELECT 'lineitem_nonempty' AS dq_check,
               CAST((SELECT COUNT(*) FROM lineitem) = 0 AS BIGINT) AS violations
        UNION ALL
        SELECT 'orders_pk_unique',
               (SELECT COUNT(*) FILTER (WHERE c > 1) FROM
                 (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey))
        UNION ALL
        SELECT 'lineitem_pk_unique',
               (SELECT COUNT(*) FILTER (WHERE c > 1) FROM
                 (SELECT COUNT(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber))
        UNION ALL
        SELECT 'orders_fk_customer',
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem_fk_orders',
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'returnflag_accepted',
               (SELECT COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R'))
                FROM lineitem)
        UNION ALL
        SELECT 'quantity_in_range',
               (SELECT COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                FROM lineitem))
      ORDER BY dq_check"""),
    doc = "X90: Deequ-style declarative DQ audit — per-constraint violation " +
      "counts + verdicts; key-only aggregates and id-only anti-joins, " +
      "payloads never move")

  val all: Seq[Q] = Seq(q89, q90, q94, q104, q108, q109, q111, q113, q204)
}
