package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpecBase

/** q89 ordered-funnel pins (the r7-verdict "weak" fix): the funnel must
  * stay correct under a planted bot user WITHOUT materializing a
  * per-user event array — the conditional-min window chain holds O(1)
  * computed state per row and buffers partitions in the spill-safe
  * window buffer, so a hot key costs disk, never a single monster row.
  */
class FunnelSpec extends SparkSpecBase {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def counts(rows: Seq[(Long, Timestamp, String)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "ts", "event_type")
    val r = Analytics.funnelCounts(df).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("bot user with 50k interleaved pre-view noise events still resolves " +
    "the greedy earliest-completion chain") {
    // 50k clicks+purchases BEFORE the first view must not count; then
    // view @100001, click @100002, purchase @100003 completes the funnel.
    val noise = (1L to 50000L).map(i =>
      (1L, ts(i), if (i % 2 == 0) "click" else "purchase"))
    val tail = Seq((1L, ts(100001), "view"), (1L, ts(100002), "click"),
      (1L, ts(100003), "purchase"))
    assert(counts(noise ++ tail) === ((1L, 1L, 1L)))
  }

  test("strictly-after semantics: same-timestamp click does not advance") {
    // click at exactly the view time is NOT after it; the later click is.
    val a = Seq((1L, ts(10), "view"), (1L, ts(10), "click"))
    assert(counts(a) === ((1L, 0L, 0L)))
    val b = a :+ ((1L, ts(11), "click"))
    assert(counts(b) === ((1L, 1L, 0L)))
  }

  test("stage order is enforced: purchase before click does not complete") {
    val rows = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "purchase"), (1L, ts(3), "click"),
      (2L, ts(1), "view"), (2L, ts(2), "click"), (2L, ts(3), "purchase"),
      (3L, ts(5), "click"))
    // user 1: view+click but its only purchase precedes the click;
    // user 2 completes; user 3 never views.
    assert(counts(rows) === ((2L, 2L, 1L)))
  }

  test("plan is array-free and single-shuffle: no collect_list, windows " +
    "share one user_id exchange") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 7, ts(i), "view"))
      .toDF("user_id", "ts", "event_type")
    val funnel = Analytics.funnelCounts(df)
    val analyzed = funnel.queryExecution.analyzed.toString
    assert(!analyzed.contains("collect_list"), analyzed)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Analytics.funnelCounts(df).queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // one hash exchange on user_id feeding the window chain + the
      // single-partition exchange for the final global aggregate;
      // the per-user rollup must NOT add a third.
      assert(shuffles.size === 2, plan.toString)
      assert("Window".r.findAllIn(plan.toString).size >= 3, plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
