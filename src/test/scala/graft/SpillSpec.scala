package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M6 (SURVEY §7): the 100-TB posture claim is that operators DEGRADE TO
  * DISK under memory pressure instead of OOMing, and that spilling never
  * changes answers. A shared-JVM test can't shrink the executor heap
  * (local mode = one fixed heap), so we squeeze the same knobs Spark's
  * own ExternalAppendOnlyUnsafeRowArraySuite/WindowExecSuite use: the
  * runtime-settable per-operator buffer thresholds. Rows past
  * `*.buffer.in.memory.threshold` go to an UnsafeExternalSorter whose
  * force-spill threshold is `*.buffer.spill.threshold`; crossing it
  * writes real spill files and bumps the task's
  * memoryBytesSpilled/diskBytesSpilled — which is exactly what a real
  * heap squeeze produces at scale, observed through the same metrics.
  */
class SpillSpec extends SparkSpecBase {

  /** Runs `action` with SQLConf overrides + a task-metrics listener;
    * returns (result, bytesSpilled summed over tasks). Restores every
    * conf afterwards (suites share one session; build.sbt forks one
    * sequential test JVM so no concurrent suite sees the overrides). */
  private def withSpillTracking[T](confs: (String, String)*)(action: => T): (T, Long) = {
    val s = spark
    val spilled = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s.sparkContext.addSparkListener(listener)
    try {
      val out = action
      // listener delivery is async: poll until the counter is stable
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1L
      while (spilled.get() != last && System.nanoTime() < deadline) {
        last = spilled.get()
        Thread.sleep(300)
      }
      (out, spilled.get())
    } finally {
      s.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
  }

  private def lineitem: DataFrame = spark.read.parquet(s"$sf/lineitem.parquet")
  private def orders: DataFrame = spark.read.parquet(s"$sf/orders.parquet")

  /** Deterministic running sum per return flag — the sequential fold
    * order is fixed by the ORDER BY, so spilled and in-memory runs must
    * be bit-identical, not merely close. */
  private def runningSum: Array[(Long, Int, Double)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem
      .select($"l_orderkey", $"l_linenumber",
        sum($"l_quantity").over(w).as("running"))
      .as[(Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
  }

  test("window operator spills to disk when its buffer is squeezed, " +
    "and the spilled result is bit-identical to the in-memory one") {
    val (inMem, base) = withSpillTracking()(runningSum)
    assert(base === 0L, "un-squeezed window run unexpectedly spilled")
    val (spilledRun, bytes) = withSpillTracking(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16")(runningSum)
    assert(bytes > 0L, "squeezed window run did not spill")
    assert(spilledRun.sameElements(inMem))
  }

  test("sort-merge join spills its per-key match buffer when squeezed; " +
    "join output matches the broadcast-join answer") {
    val s = spark
    import s.implicits._
    def joined: Array[(Long, Long, Double)] =
      orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
    val (viaBroadcast, _) = withSpillTracking()(joined)
    val (viaSmjSpill, bytes) = withSpillTracking(
      // forbid broadcast (both planner and AQE) so the join stays SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // any order key with >1 lineitem overflows the 1-row buffer
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "1")(joined)
    assert(bytes > 0L, "squeezed sort-merge join did not spill")
    assert(viaSmjSpill.sameElements(viaBroadcast))
  }

  test("MinHash-LSH near-dup pipeline returns identical pairs under " +
    "forced spilling (answers never depend on the memory budget)") {
    val s = spark
    import s.implicits._
    val d = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    val corpus = d.unionByName(d.filter($"doc_id" % 5 === 0).select(
      ($"doc_id" + 100000).as("doc_id"),
      concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text")))
    def pairs: Set[(Long, Long)] =
      operators.MinHashLSH.nearDupPairs(corpus, "doc_id", "text", 0.5)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val (easy, _) = withSpillTracking()(pairs)
    val (tight, bytes) = withSpillTracking(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "1")(pairs)
    info(s"pipeline spilled $bytes bytes under the squeezed budget")
    assert(easy.nonEmpty && tight === easy)
  }

  test("PrefixScan spills its per-bucket window buffer when squeezed and " +
    "the cumulative sums are bit-identical (de-skew path degrades, not OOMs)") {
    val s = spark
    import s.implicits._
    def cums: Array[(Long, Long)] = {
      val li = s.read.parquet(s"$sf/lineitem.parquet")
        .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
          $"l_linenumber", lit(1L).as("one"))
      operators.PrefixScan.inclusive(li, Seq("l_returnflag"),
          "l_extendedprice", Seq("l_orderkey", "l_linenumber"), "one",
          _ / 2000d, "rk", Some("n"))
        .select($"l_orderkey" * 10 + $"l_linenumber", $"rk")
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    val (inMem, base) = withSpillTracking()(cums)
    assert(base === 0L, "un-squeezed PrefixScan run unexpectedly spilled")
    val (spilledRun, bytes) = withSpillTracking(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16")(cums)
    assert(bytes > 0L, "squeezed PrefixScan run did not spill")
    assert(spilledRun.sameElements(inMem))
  }
}
