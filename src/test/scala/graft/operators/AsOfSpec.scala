package graft.operators

import graft.SparkSpecBase

/** Unit semantics of the as-of join (SURVEY.md J8): per-key latest
  * right row with ts <= left.ts; ties at equal ts visible; deterministic
  * tie-break by largest tieBreak value.
  */
class AsOfSpec extends SparkSpecBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("k1", 10L, "L-a"),
      ("k1", 20L, "L-b"),
      ("k1", 5L, "L-early"),
      ("k2", 15L, "L-c")
    ).toDF("key", "ts", "lval").withColumn("event_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    val right = Seq(
      ("k1", 10L, 100, "R-1"),
      ("k1", 10L, 101, "R-2"),   // same ts, larger event_id wins
      ("k1", 18L, 102, "R-3"),
      ("k2", 99L, 103, "R-later") // after every k2 left row
    ).toDF("key", "ts", "event_id", "rval")
    (left, right)
  }

  test("attaches most recent right row with ts <= left ts, per key") {
    val (left, right) = fixture
    val out = AsOf.join(left, right, Seq("key"), "ts")
      .select("key", "ts", "lval", "asof_rval")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(out === Set(
      ("k1", 5L, "L-early", null),    // nothing at or before ts=5
      ("k1", 10L, "L-a", "R-2"),      // tie at ts=10 -> larger event_id
      ("k1", 20L, "L-b", "R-3"),      // latest <= 20 is ts=18
      ("k2", 15L, "L-c", null)        // k2's only right row is later
    ))
  }

  test("row count is preserved (exactly one output row per left row)") {
    val (left, right) = fixture
    assert(AsOf.join(left, right, Seq("key"), "ts").count() === left.count())
  }

  test("a right row with a NULL value column wins WHOLE — no torn fields " +
    "mixing asof_ts and values from different right rows") {
    val s = spark
    import s.implicits._
    val left = Seq(("k", 30L)).toDF("key", "ts")
      .withColumn("event_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    val right = Seq(
      ("k", 10L, 100, Some("old")),
      ("k", 20L, 101, None: Option[String]) // most recent, value is NULL
    ).toDF("key", "ts", "event_id", "rval")
    val row = AsOf.join(left, right, Seq("key"), "ts")
      .select("asof_ts", "asof_rval").head()
    assert(row.getLong(0) === 20L)  // ts from the latest right row...
    assert(row.isNullAt(1))         // ...and rval from the SAME row (null), not "old"
  }
}
