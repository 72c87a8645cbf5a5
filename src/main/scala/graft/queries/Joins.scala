package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.3 — the join surface (J1-J10).
  *
  * Scale posture: dims (region/nation, and customer vs orders) are
  * broadcast; fact-fact joins shuffle on their equi keys (sort-merge /
  * shuffled-hash picked by Catalyst + AQE); the one pure-range join is
  * keyed per-user first so it never degrades to a global nested loop;
  * the self-join is banded (equality on grouping cols) to avoid O(n^2).
  */
object Joins {

  /** q05 — inner equi-join orders x customer, agg by segment (J1 A1). */
  val q05 = Q(
    "q05_join_inner",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .orderBy($"c_mktsegment")
    },
    Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    doc = "J1: shuffle equi-join on custkey; at scale AQE may flip to broadcast")

  /** q06 — broadcast star join: customer->nation->region revenue (J2). */
  val q06 = Q(
    "q06_join_broadcast_star",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""
      SELECT r_name, n_name, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    doc = "J2: explicit broadcast() of 25/5-row dims; no shuffle for dim joins")

  /** q07 — left outer join: order count per customer incl. zeros (J3). */
  val q07 = Q(
    "q07_join_left_outer",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          coalesce(toDbl(sum(money($"o_totalprice"))), lit(0.0)).as("total"))
        .orderBy($"c_custkey")
    },
    Some(s"""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(${sqlToDbl(s"SUM(${sqlMoney("o_totalprice")})")}, 0.0) AS total
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""),
    doc = "J3: left outer preserves customers without orders (count=0)")

  /** q08 — full outer join over two aggregates keyed by date (J3). */
  val q08 = Q(
    "q08_join_full_outer",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val urgent = o.filter($"o_orderpriority" === "1-URGENT")
        .groupBy(to_date($"o_orderdate").as("d")).agg(count(lit(1)).as("n_urgent"))
      val high = o.filter($"o_orderpriority" === "2-HIGH")
        .groupBy(to_date($"o_orderdate").as("d")).agg(count(lit(1)).as("n_high"))
      urgent.join(high, Seq("d"), "full_outer")
        .select($"d", coalesce($"n_urgent", lit(0L)).as("n_urgent"),
          coalesce($"n_high", lit(0L)).as("n_high"))
        .orderBy($"d")
    },
    Some("""
      SELECT COALESCE(u.d, h.d) AS d,
             COALESCE(n_urgent, 0) AS n_urgent, COALESCE(n_high, 0) AS n_high
      FROM (SELECT CAST(o_orderdate AS DATE) d, COUNT(*) n_urgent FROM orders
            WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u
      FULL OUTER JOIN
           (SELECT CAST(o_orderdate AS DATE) d, COUNT(*) n_high FROM orders
            WHERE o_orderpriority = '2-HIGH' GROUP BY 1) h
      ON u.d = h.d
      ORDER BY d"""),
    doc = "J3: full outer merge of two keyed aggregates")

  /** q09 — left semi: customers with >=1 urgent order (J4, EXISTS). */
  val q09 = Q(
    "q09_join_semi",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
    doc = "J4: EXISTS rewrites to left-semi; no row multiplication")

  /** q10 — left anti: customers with no urgent orders (J5, NOT EXISTS). */
  val q10 = Q(
    "q10_join_anti",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
    doc = "J5: NOT EXISTS -> left-anti")

  /** q11 — range (theta) join keyed per user: clicks within 1h after a
    * signup by the same user (J6). The equi key (user_id) keeps this a
    * hash/merge join with a residual range predicate — at 100 TB this
    * never becomes a nested loop. */
  val q11 = Q(
    "q11_join_range",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir, "events")
      val signups = e.filter($"event_type" === "signup")
        .select($"user_id".as("su"), $"ts".as("signup_ts"))
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("click_ts"), $"event_id")
      clicks.join(signups,
          $"cu" === $"su" && $"click_ts" >= $"signup_ts" &&
            $"click_ts" < $"signup_ts" + expr("INTERVAL 1 HOUR"))
        .groupBy($"cu".as("user_id"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct($"event_id").as("n_clicks"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT c.user_id AS user_id, COUNT(*) AS n_pairs,
             COUNT(DISTINCT c.event_id) AS n_clicks
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON c.user_id = s.user_id
       AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
      GROUP BY c.user_id ORDER BY user_id"""),
    doc = "J6: equi key + residual range predicate; avoids BNLJ")

  /** q12 — cross join of the two small dims (J7). */
  val q12 = Q(
    "q12_cross_join",
    (s, dir) => {
      import s.implicits._
      val r = Tables(s, dir, "region").select($"r_regionkey", $"r_name")
      val n = Tables(s, dir, "nation").select($"n_nationkey", $"n_name")
      r.crossJoin(n)
        .select($"r_regionkey", $"n_nationkey",
          concat($"r_name", lit("/"), $"n_name").as("pair"))
        .orderBy($"r_regionkey", $"n_nationkey")
    },
    Some("""
      SELECT r_regionkey, n_nationkey, r_name || '/' || n_name AS pair
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey"""),
    doc = "J7: cartesian of 5x25 dims (only ever for small sides)")

  /** q13 — as-of join (J8): for every purchase, the latest click at or
    * before it by the same user. Implemented with the union+window idiom
    * (graft.operators.AsOf) — a single shuffle on (user, ts), no range
    * explosion; this is the Spark-native as-of formulation. */
  val q13 = Q(
    "q13_asof_join",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", $"value")
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", $"value")
      graft.operators.AsOf.join(purchases, clicks, Seq("user_id"), "ts")
        .select($"user_id", $"event_id", $"ts",
          $"asof_ts", $"asof_value")
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
           u AS (
             SELECT user_id, ts, event_id, NULL AS c_ts, NULL AS c_value, 1 AS is_left,
                    NULL AS c_eid FROM p
             UNION ALL
             SELECT user_id, ts, NULL, ts, value, 0, event_id FROM c),
           w AS (
             SELECT user_id, ts, event_id, is_left,
               last_value(c_ts IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, is_left, COALESCE(c_eid, event_id)
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts,
               last_value(c_value IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, is_left, COALESCE(c_eid, event_id)
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
             FROM u)
      SELECT user_id, event_id, ts, CAST(asof_ts AS TIMESTAMP) AS asof_ts,
             CAST(asof_value AS DOUBLE) AS asof_value
      FROM w WHERE is_left = 1
      ORDER BY user_id, event_id"""),
    doc = "J8: as-of via union + last_value(ignore nulls) window — one shuffle")

  /** q14 — interval overlap join (J9): 30-day order windows x calendar
    * quarters. Quarters are derived (tiny) and broadcast; at scale the
    * generic interval-interval case would bucket both sides by
    * coarse time range first (graft.operators.IntervalJoin). */
  val q14 = Q(
    "q14_interval_join",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .select($"o_orderkey", to_date($"o_orderdate").as("start_d"),
          date_add(to_date($"o_orderdate"), 30).as("end_d"))
      val quarters = Tables(s, dir, "orders")
        .select(to_date(date_trunc("quarter", $"o_orderdate")).as("q_start"))
        .distinct()
        .withColumn("q_end", add_months($"q_start", 3))
      o.join(broadcast(quarters),
          $"start_d" < $"q_end" && $"q_start" < $"end_d")
        .groupBy($"q_start")
        .agg(count(lit(1)).as("n_overlapping"))
        .orderBy($"q_start")
    },
    Some("""
      WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
                        CAST(o_orderdate AS DATE) + 30 AS end_d FROM orders),
           q AS (SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
                 FROM orders),
           qq AS (SELECT q_start, CAST(q_start + INTERVAL 3 MONTH AS DATE) AS q_end FROM q)
      SELECT q_start, COUNT(*) AS n_overlapping
      FROM o JOIN qq ON start_d < q_end AND q_start < end_d
      GROUP BY q_start ORDER BY q_start"""),
    doc = "J9: interval overlap; small side broadcast, bucketed prejoin at scale")

  /** q15 — banded self-join (J10): candidate doc pairs sharing
    * (source, n_chars) — the blocking-key idiom that keeps self-joins
    * off O(n^2) at scale. */
  val q15 = Q(
    "q15_self_join_banded",
    (s, dir) => {
      import s.implicits._
      val d1 = Tables(s, dir, "documents").select($"doc_id", $"source", $"n_chars")
      val d2 = d1.select($"doc_id".as("doc_id2"), $"source".as("source2"),
        $"n_chars".as("n_chars2"))
      d1.join(d2, $"source" === $"source2" && $"n_chars" === $"n_chars2" &&
          $"doc_id" < $"doc_id2")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_candidate_pairs"))
        .orderBy($"source")
    },
    Some("""
      SELECT d1.source AS source, COUNT(*) AS n_candidate_pairs
      FROM documents d1 JOIN documents d2
        ON d1.source = d2.source AND d1.n_chars = d2.n_chars
       AND d1.doc_id < d2.doc_id
      GROUP BY d1.source ORDER BY source"""),
    doc = "J10: self-join on blocking keys (source, n_chars)")

  val all: Seq[Q] = Seq(q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15)
}
