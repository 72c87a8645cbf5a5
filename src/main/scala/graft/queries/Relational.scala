package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables, Exact}
import Exact._

/** SURVEY.md §2.1-§2.2 + §2.4 core: scans, projection, filters, hash
  * aggregation. Flagship is q01 (TPC-H Q1 shape, SURVEY §7 M0).
  *
  * Scale notes (100 TB posture): every query here is scan -> (filter) ->
  * partial agg -> exchange on the group keys -> final agg. Filters and
  * column projections push into the parquet scan (verified via
  * .explain: PushedFilters / ReadSchema); group-by cardinality is tiny
  * relative to input so the shuffle moves only partial aggregates.
  */
object Relational {

  /** q01 — pricing summary (scan+filter+groupBy+multi-agg+sort).
    * Ref capability: analytics over the indexed store
    * (reference README.md:102-104); corpus shape: TPC-H Q1. */
  val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          toDbl(sum(money($"l_extendedprice") * oneMinus($"l_discount")))
            .as("sum_disc_price"),
          toDbl(sum(money($"l_extendedprice") * oneMinus($"l_discount")
            * onePlus($"l_tax"))).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlToDbl(s"SUM(${sqlMoney("l_extendedprice")} * ${sqlOneMinus("l_discount")})")} AS sum_disc_price,
        ${sqlToDbl(s"SUM(${sqlMoney("l_extendedprice")} * ${sqlOneMinus("l_discount")} * ${sqlOnePlus("l_tax")})")} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "TPC-H Q1 shape: A1 A2 A6 P3 O1")

  /** q02 — scan + projection + global multi-key sort (S1 P1 O1). */
  val q02 = Q(
    "q02_scan_project_sort",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderstatus".asc, $"o_totalprice".desc, $"o_orderkey".asc)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC"""),
    doc = "S1 P1 O1: projection pushed to parquet ReadSchema; range-partitioned sort")

  /** q03 — filter surface: IN-list, BETWEEN, LIKE, boolean ops (P3 P5). */
  val q03 = Q(
    "q03_filter_predicates",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter(
          $"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
          $"o_totalprice".between(1000.0, 200000.0) &&
          $"o_orderstatus".like("%O%") &&
          !($"o_custkey" % 10 === 0))
        .select($"o_orderkey", $"o_custkey", $"o_orderpriority", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_totalprice BETWEEN 1000.0 AND 200000.0
        AND o_orderstatus LIKE '%O%'
        AND NOT (o_custkey % 10 = 0)
      ORDER BY o_orderkey"""),
    doc = "P3 P5: predicates push into parquet scan (PushedFilters)")

  /** q04 — computed projection + CASE WHEN + null handling (P2 P4 P6).
    * nullif manufactures NULLs deterministically so coalesce/isnull are
    * actually exercised (corpus has no nulls). */
  val q04 = Q(
    "q04_case_null_projection",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .select(
          $"c_custkey",
          (money($"c_acctbal") * 2).cast(DoubleType).as("bal2x"),
          when($"c_acctbal" < 0, "overdrawn")
            .when($"c_acctbal" < 1000, "low")
            .otherwise("high").as("bal_band"),
          nullif($"c_mktsegment", lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("UNK")).as("seg_filled"),
          nullif($"c_mktsegment", lit("BUILDING")).isNull.as("is_building"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey,
        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 2 AS DOUBLE) AS bal2x,
        CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             WHEN c_acctbal < 1000 THEN 'low'
             ELSE 'high' END AS bal_band,
        NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNK') AS seg_filled,
        NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building
      FROM customer
      ORDER BY c_custkey"""),
    doc = "P2 P4 P6: case/when, nullif/coalesce/isNull")

  val all: Seq[Q] = Seq(q01, q02, q03, q04)
}
