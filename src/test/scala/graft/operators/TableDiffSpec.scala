package graft.operators

import graft.SparkSpecBase

class TableDiffSpec extends SparkSpecBase {

  test("diff classifies added/removed/changed/same, including null cells") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, Option("a"), Option(10)), // same
      (2L, Option("b"), Option(20)), // changed value
      (3L, None: Option[String], Option(30)), // same, with a null cell
      (4L, Option("d"), None: Option[Int]), // removed
      (5L, Option("e"), Option(50)) // null flips to value -> changed
    ).toDF("k", "s", "v")
    val right = Seq(
      (1L, Option("a"), Option(10)),
      (2L, Option("B"), Option(20)),
      (3L, None: Option[String], Option(30)),
      (5L, Option("e"), None: Option[Int]),
      (6L, Option("f"), Option(60)) // added
    ).toDF("k", "s", "v")
    val got = TableDiff.diff(left, right, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("fingerprint is separator- and sentinel-unambiguous: ('a|b','c') " +
    "differs from ('a','b|c'); tag-shaped data differs from a real null") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, Option("a|b"), Option("c")), // separator inside a value
      (2L, Option("N"), Option("x")),   // value equal to the null tag
      (3L, Option("V1:x"), None: Option[String]) // value shaped like a V-term
    ).toDF("k", "x", "y")
    val right = Seq(
      (1L, Option("a"), Option("b|c")),
      (2L, None: Option[String], Option("x")),
      (3L, Option("V1:x"), None: Option[String])
    ).toDF("k", "x", "y")
    val got = TableDiff.diff(left, right, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed", 3L -> "same"))
  }

  test("fingerprint compresses the shuffle: the join's exchange carries " +
    "key+hash columns only, never the payload columns") {
    val s = spark
    val left = graft.core.Tables(s, sf, "orders")
    val right = left
    val plan = TableDiff.diff(left, right, Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    // every exchange in the plan moves only the key and a fingerprint
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    exchanges.foreach(e => assert(!e.contains("o_comment") && !e.contains("o_totalprice"), e))
    assert(!plan.contains("o_clerk") || !plan.linesIterator
      .filter(_.contains("Exchange")).exists(_.contains("o_clerk")))
  }

  test("schema mismatch fails loudly instead of diffing column subsets") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 2)).toDF("k", "s", "extra")
    val e = intercept[IllegalArgumentException](TableDiff.diff(a, b, Seq("k")))
    assert(e.getMessage.contains("schema mismatch"))
  }
}
