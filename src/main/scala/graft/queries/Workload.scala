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

  val all: Seq[Q] = Seq(q97, q98)
}
