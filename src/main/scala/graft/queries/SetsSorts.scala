package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.6 (sorts/limits/top-k) + §2.7 (set operations).
  *
  * Scale posture: union is a zero-shuffle concatenation of partitions;
  * distinct/intersect/except shuffle once on the full row. Global top-k
  * compiles to TakeOrderedAndProject — per-partition heaps of size k,
  * never a full global sort. dropDuplicates with a deterministic survivor
  * uses the min-id aggregate form so the result is partition-order-free.
  */
object SetsSorts {

  /** q31 — union all + union distinct (U1): merge two ingest paths. */
  val q31 = Q(
    "q31_union",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir, "events")
      val a = e.filter($"event_type" === "click").select($"user_id")
      val b = e.filter($"event_type" === "purchase").select($"user_id")
      val allu = a.unionByName(b).groupBy($"user_id").agg(count(lit(1)).as("n_all"))
      val dist = a.unionByName(b).distinct()
        .groupBy($"user_id").agg(count(lit(1)).as("n_dist"))
      allu.join(dist, Seq("user_id")).orderBy($"user_id")
    },
    Some("""
      WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
           b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
           u AS (SELECT user_id, COUNT(*) AS n_all FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY user_id),
           d AS (SELECT user_id, COUNT(*) AS n_dist FROM (SELECT * FROM a UNION SELECT * FROM b) GROUP BY user_id)
      SELECT u.user_id AS user_id, n_all, n_dist FROM u JOIN d ON u.user_id = d.user_id
      ORDER BY user_id"""),
    doc = "U1: union all = partition concat (no shuffle); distinct adds one")

  /** q32 — intersect / except, distinct and multiset (U2 U3). */
  val q32 = Q(
    "q32_intersect_except",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir, "events")
      val clickers = e.filter($"event_type" === "click").select($"user_id")
      val buyers = e.filter($"event_type" === "purchase").select($"user_id")
      val both = clickers.intersect(buyers)
        .withColumn("relation", lit("click_and_buy"))
      val onlyClick = clickers.distinct().except(buyers)
        .withColumn("relation", lit("click_no_buy"))
      both.unionByName(onlyClick)
        .select($"relation", $"user_id")
        .orderBy($"relation", $"user_id")
    },
    Some("""
      SELECT 'click_and_buy' AS relation, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
      UNION ALL
      SELECT 'click_no_buy', user_id FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase')
      ORDER BY relation, user_id"""),
    doc = "U2 U3: intersect/except rewrite to semi/anti joins under the hood")

  /** q33 — exceptAll / intersectAll multiset semantics (U2 U3). */
  val q33 = Q(
    "q33_multiset_ops",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir, "events")
      val views = e.filter($"event_type" === "view").select($"user_id")
      val clicks = e.filter($"event_type" === "click").select($"user_id")
      views.exceptAll(clicks)
        .groupBy($"user_id").agg(count(lit(1)).as("surplus_views"))
        .join(
          views.intersectAll(clicks)
            .groupBy($"user_id").agg(count(lit(1)).as("matched")),
          Seq("user_id"), "full_outer")
        .select($"user_id",
          coalesce($"surplus_views", lit(0L)).as("surplus_views"),
          coalesce($"matched", lit(0L)).as("matched"))
        .orderBy($"user_id")
    },
    Some("""
      WITH v AS (SELECT user_id FROM events WHERE event_type = 'view'),
           c AS (SELECT user_id FROM events WHERE event_type = 'click'),
           ea AS (SELECT user_id, COUNT(*) AS surplus_views
                  FROM (SELECT * FROM v EXCEPT ALL SELECT * FROM c) GROUP BY user_id),
           ia AS (SELECT user_id, COUNT(*) AS matched
                  FROM (SELECT * FROM v INTERSECT ALL SELECT * FROM c) GROUP BY user_id)
      SELECT COALESCE(ea.user_id, ia.user_id) AS user_id,
             COALESCE(surplus_views, 0) AS surplus_views,
             COALESCE(matched, 0) AS matched
      FROM ea FULL OUTER JOIN ia ON ea.user_id = ia.user_id
      ORDER BY user_id"""),
    doc = "U2 U3 multiset: per-key multiplicity arithmetic, one agg each side")

  /** q34 — dedup by key subset with a deterministic survivor (U4):
    * keep the min event_id per (user_id, event_type). dropDuplicates'
    * arbitrary survivor is not oracle-checkable; the min-id form is the
    * deterministic idiom and costs the same single shuffle. */
  val q34 = Q(
    "q34_dedup_subset",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"event_id")
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", $"ts")
        .orderBy($"user_id", $"event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
          row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id, event_type"""),
    doc = "U4: deterministic dropDuplicates — row_number=1 on the dedup key")

  /** q35 — global sort + limit fused to top-k (O2 O3): 50 most valuable
    * orders. Compiles to TakeOrderedAndProject (per-partition heaps). */
  val q35 = Q(
    "q35_topk_global",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50"""),
    doc = "O2 O3: orderBy+limit fuses to TakeOrderedAndProject — no global sort")

  val all: Seq[Q] = Seq(q31, q32, q33, q34, q35)
}
