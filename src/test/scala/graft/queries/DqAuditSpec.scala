package graft.queries

import graft.SparkSpecBase

/** q204 constraint semantics on planted violations — each constraint
  * must FIRE with the exact violation count (the driver corpus already
  * proves one genuinely-firing check cross-engine; this proves the
  * other five aren't wired to constant zero). */
class DqAuditSpec extends SparkSpecBase {

  test("every constraint fires with the exact planted violation count") {
    val s = spark
    import s.implicits._
    // lineitem: dup composite key (1,1)x2; orphan orderkey 99; qty 0 and 99
    val li = Seq(
      (1L, 1, 5.0, "A"), (1L, 1, 7.0, "N"), (1L, 2, 0.0, "R"),
      (2L, 1, 99.0, "Z"), (99L, 1, 3.0, "A"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    // orders: dup pk 2x2; orphan custkey 77
    val ord = Seq((1L, 10L), (2L, 77L), (2L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq(Tuple1(10L)).toDF("c_custkey")
    val got = Analytics.dqReport(li, ord, cust)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got("lineitem_nonempty") === (0L, 1))
    assert(got("lineitem_pk_unique") === (1L, 0))   // key (1,1) duplicated
    assert(got("orders_pk_unique") === (1L, 0))     // key 2 duplicated
    assert(got("orders_fk_customer") === (1L, 0))   // custkey 77 orphan
    assert(got("lineitem_fk_orders") === (1L, 0))   // orderkey 99 orphan
    assert(got("returnflag_accepted") === (1L, 0))  // 'Z'
    assert(got("quantity_in_range") === (2L, 0))    // 0.0 and 99.0
  }

  test("a clean dataset passes every constraint") {
    val s = spark
    import s.implicits._
    val li = Seq((1L, 1, 5.0, "A"), (1L, 2, 7.0, "N"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val ord = Seq((1L, 10L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq(Tuple1(10L)).toDF("c_custkey")
    val got = Analytics.dqReport(li, ord, cust)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got.values.forall(_ == 1), got.toString)
  }
}
