package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.4 — the aggregation surface (A1-A10).
  *
  * Scale posture: every groupBy here is a two-phase hash aggregate
  * (partial map-side combine, exchange on group keys, final) — the shuffle
  * carries only partial states, never raw rows. countDistinct expands to
  * a two-level aggregate (exact, shuffles the distinct keys once);
  * approx_count_distinct keeps a constant-size HLL sketch per group and
  * is the 100 TB path. All float outputs go through graft.core.Exact's
  * DECIMAL protocol so results are identical across any partitioning.
  */
object Aggregates {

  /** q16 — exact count(distinct) per group, multiple distincts (A3). */
  val q16 = Q(
    "q16_count_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("n_users"),
          countDistinct($"user_id", $"value").as("n_user_values"),
          count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT (user_id, value)) AS n_user_values,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type"""),
    doc = "A3: exact distinct = expand + two-phase agg; one extra shuffle")

  /** q17 — global (no-key) aggregate over lineitem (A6). */
  val q17 = Q(
    "q17_global_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n_rows"),
          dsum($"l_quantity").as("sum_qty"),
          min($"l_shipdate").as("min_ship"),
          max($"l_shipdate").as("max_ship"),
          countDistinct($"l_partkey").as("n_parts"))
    },
    Some(s"""
      SELECT COUNT(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty,
             MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
             COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem"""),
    doc = "A6: single-row global aggregate; partial agg makes the final a 32-row reduce")

  /** q18 — collect_list / collect_set with deterministic array order (A7). */
  val q18 = Q(
    "q18_collect",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(
          array_join(sort_array(collect_set($"o_orderpriority")), "|").as("priorities"),
          array_join(sort_array(collect_list($"o_orderstatus")), "|").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey,
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
             array_to_string(list_sort(list(o_orderstatus)), '|') AS statuses,
             COUNT(*) AS n
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
    doc = "A7: set-like arrays sorted for determinism then rendered '|'-joined " +
      "(scalar cells — driver compare can't sort array cells); lists stay bounded per key")

  /** q19 — stddev / variance / correlation / percentiles (A8), computed
    * hash-exactly: decimal power sums rendered to double, then the moment
    * formulas evaluated with the identical IEEE expression in both engines.
    * Stock stddev()/corr() stream doubles in partition order and are not
    * reproducible across partitionings — these are. */
  val q19 = Q(
    "q19_stats",
    (s, dir) => {
      import s.implicits._
      val q = money($"l_quantity")
      val d = rate($"l_discount")
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          toDbl(sum(q)).as("sx"), toDbl(sum(q * q)).as("sxx"),
          toDbl(sum(d)).as("sy"), toDbl(sum(d * d)).as("syy"),
          toDbl(sum(q * d)).as("sxy"),
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"))
        .select($"l_returnflag",
          $"cnt",
          (($"sxx" - $"sx" * $"sx" / $"cnt") / ($"cnt" - 1)).as("var_qty"),
          sqrt(($"sxx" - $"sx" * $"sx" / $"cnt") / ($"cnt" - 1)).as("std_qty"),
          (($"cnt" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"cnt" * $"sxx" - $"sx" * $"sx") *
             sqrt($"cnt" * $"syy" - $"sy" * $"sy"))).as("corr_qty_disc"),
          $"q25", $"q50", $"q75")
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag, COUNT(*) AS cnt,
          ${sqlToDbl(s"SUM(${sqlMoney("l_quantity")})")} AS sx,
          ${sqlToDbl(s"SUM(${sqlMoney("l_quantity")} * ${sqlMoney("l_quantity")})")} AS sxx,
          ${sqlToDbl(s"SUM(${sqlRate("l_discount")})")} AS sy,
          ${sqlToDbl(s"SUM(${sqlRate("l_discount")} * ${sqlRate("l_discount")})")} AS syy,
          ${sqlToDbl(s"SUM(${sqlMoney("l_quantity")} * ${sqlRate("l_discount")})")} AS sxy,
          quantile_cont(l_quantity, 0.25) AS q25,
          quantile_cont(l_quantity, 0.5) AS q50,
          quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, cnt,
        (sxx - sx * sx / cnt) / (cnt - 1) AS var_qty,
        sqrt((sxx - sx * sx / cnt) / (cnt - 1)) AS std_qty,
        (cnt * sxy - sx * sy) /
          (sqrt(cnt * sxx - sx * sx) * sqrt(cnt * syy - sy * sy)) AS corr_qty_disc,
        q25, q50, q75
      FROM m ORDER BY l_returnflag"""),
    doc = "A8: moments from exact decimal power sums; percentiles on int-valued doubles")

  /** q20 — filtered / conditional aggregation: the event funnel (A9). */
  val q20 = Q(
    "q20_filtered_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          count(when($"event_type" === "view", 1)).as("n_views"),
          count(when($"event_type" === "click", 1)).as("n_clicks"),
          count(when($"event_type" === "purchase", 1)).as("n_purchases"),
          toDbl(sum(when($"event_type" === "purchase", money($"value"))))
            .as("purchase_value"))
        .filter($"n_purchases" > 0)
        .orderBy($"user_id")
    },
    Some(s"""
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
        COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        ${sqlToDbl(s"SUM(${sqlMoney("value")}) FILTER (WHERE event_type = 'purchase')")}
          AS purchase_value
      FROM events GROUP BY user_id HAVING COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
      ORDER BY user_id"""),
    doc = "A9: conditional counts in one pass — no self-joins for funnels")

  /** q21 — rollup with grouping_id (A5): region/nation revenue hierarchy. */
  val q21 = Q(
    "q21_rollup",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("acctbal"),
          grouping_id().as("gid"))
        .orderBy($"gid", $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    },
    Some(s"""
      SELECT r_name, n_name, COUNT(*) AS n_cust,
             ${sqlDsum("c_acctbal")} AS acctbal, GROUPING(r_name, n_name) AS gid
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""),
    doc = "A5: rollup = one expanded aggregate, not N queries; gid bit order matches")

  /** q22 — cube over two independent dims (A5). */
  val q22 = Q(
    "q22_cube",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
          grouping_id().as("gid"))
        .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    },
    Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ${sqlDsum("o_totalprice")} AS total,
             GROUPING(o_orderstatus, o_orderpriority) AS gid
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""),
    doc = "A5: cube expands 4 grouping sets in one pass")

  /** q23 — SQL GROUPING SETS (A5), exercising the spark.sql path. */
  val q23 = Q.sql(
    "q23_grouping_sets",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    doc = "A5: explicit grouping sets, same text both engines")

  /** q24 — approx distinct (A4): HLL sketch per group. The sketch is the
    * 100 TB path (constant memory per group vs expand-shuffle for exact).
    * No DuckDB oracle — its HLL differs; accuracy is asserted in
    * ApproxSpec against the exact count (rsd bound). */
  val q24 = Q(
    "q24_approx_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    None,
    doc = "A4: approx_count_distinct(rsd=2%); tolerance-checked in ScalaTest")

  val all: Seq[Q] = Seq(q16, q17, q18, q19, q20, q21, q22, q23, q24)
}
