package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Laws for [[PrefixScan]] — the de-skewed running-sum primitive must
  * agree bit-for-bit with the single-task window it replaces, on every
  * shape it is used for (ties, multiple groups, zero-weight query
  * rows), regardless of how the bucketing slices the order axis. */
class PrefixScanSpec extends SparkSpecBase {
  import spark.implicits._

  // Deterministic pseudo-random fixture: 3 groups, tie-heavy values.
  private lazy val data = {
    val rnd = new scala.util.Random(42)
    (1 to 500).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toDouble, i.toLong,
        (rnd.nextInt(9) + 1).toLong)
    }.toDF("g", "v", "tie", "w")
  }

  test("inclusive cum equals the single-window running sum, for coarse, " +
    "fine, and degenerate-single bucketings") {
    val w = Window.partitionBy($"g").orderBy($"v", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = data.withColumn("cum", sum($"w").over(w))
      .select($"g", $"tie", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (width <- Seq(1d, 7d, 1000000d)) {
      val got = PrefixScan.inclusive(data, Seq("g"), "v", Seq("tie"), "w",
          _ / width, "cum")
        .select($"g", $"tie", $"cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, s"width=$width")
    }
  }

  test("zero-weight query rows tie-ordered before data read the strict " +
    "prefix count (q27's band-boundary device)") {
    // data rows: ord=1, weight=count; query rows: ord=0 at value x read
    // count(v < x) — including x values between and beyond data values
    val pts = Seq(
      ("a", 10d, 1, 3L), ("a", 10d, 1, 2L), ("a", 20d, 1, 1L),
      ("b", 5d, 1, 4L)
    ).toDF("g", "v", "ord", "w")
    val queries = Seq(
      ("a", 9d), ("a", 10d), ("a", 15d), ("a", 20d), ("a", 99d),
      ("b", 5d), ("b", 4d)
    ).toDF("g", "qv")
    val unioned = pts.unionByName(
      queries.select($"g", $"qv".as("v"), lit(0).as("ord"), lit(0L).as("w")))
    val got = PrefixScan.inclusive(unioned, Seq("g"), "v", Seq("ord"), "w",
        _ / 8d, "cum")
      .filter($"ord" === 0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(4)).toMap
    assert(got === Map(
      ("a", 9d) -> 0L, ("a", 10d) -> 0L, ("a", 15d) -> 5L,
      ("a", 20d) -> 5L, ("a", 99d) -> 6L,
      ("b", 5d) -> 0L, ("b", 4d) -> 0L))
  }

  test("the riding totalCol equals the per-group weight sum on every row") {
    val got = PrefixScan.inclusive(data, Seq("g"), "v", Seq("tie"), "w",
        _ / 7d, "cum", Some("n"))
      .select($"g", $"n").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = data.groupBy($"g").agg(sum($"w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)
  }

  test("NULL group values form one ordinary group (null-safe offset join " +
    "— PARTITION BY semantics, no silent row loss)") {
    val withNullGroup = Seq(
      (Option("a"), 1d, 1L, 2L), (Option("a"), 2d, 2L, 3L),
      (None, 1d, 3L, 5L), (None, 2d, 4L, 7L), (None, 3d, 5L, 11L)
    ).toDF("g", "v", "tie", "w")
    val got = PrefixScan.inclusive(withNullGroup, Seq("g"), "v", Seq("tie"),
        "w", _ / 2d, "cum", Some("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2)) ->
        (r.getAs[Long]("cum"), r.getAs[Long]("n"))).toMap
    assert(got.size === 5) // nothing dropped
    assert(got((None, 3L)) === ((5L, 23L)))
    assert(got((None, 4L)) === ((12L, 23L)))
    assert(got((None, 5L)) === ((23L, 23L)))
    assert(got((Some("a"), 2L)) === ((5L, 5L)))
  }

  test("a NULL order value fails loudly instead of silently dropping rows") {
    val withNull = Seq(("a", Some(1d), 1L, 1L), ("a", None, 2L, 1L))
      .toDF("g", "v", "tie", "w")
    val ex = intercept[Exception] {
      PrefixScan.inclusive(withNull, Seq("g"), "v", Seq("tie"), "w", _ / 2d, "cum")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("PrefixScan") &&
      m.contains("NULL")))
  }

  test("incremental histogram quantiles: base + deltas merge to EXACTLY the " +
    "full-rebuild histogram and quantiles (X50 law)") {
    val full = data.select($"g", $"v")
    val p0 = data.filter($"tie" % 3 === 0).select($"g", $"v")
    val p1 = data.filter($"tie" % 3 === 1).select($"g", $"v")
    val p2 = data.filter($"tie" % 3 === 2).select($"g", $"v")
    val keys = Seq("g")
    val merged = IncrementalAgg.mergeHist(
      IncrementalAgg.mergeHist(
        IncrementalAgg.summarizeHist(p0, keys, "v"),
        IncrementalAgg.summarizeHist(p1, keys, "v"), keys, "v"),
      IncrementalAgg.summarizeHist(p2, keys, "v"), keys, "v")
    val rebuild = IncrementalAgg.summarizeHist(full, keys, "v")
    def canonH(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(canonH(merged) === canonH(rebuild))
    def canonQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val qs = Seq("p50" -> 50, "p95" -> 95)
    assert(canonQ(IncrementalAgg.histQuantiles(merged, keys, "v", _ / 8d, qs))
      === canonQ(IncrementalAgg.histQuantiles(rebuild, keys, "v", _ / 8d, qs)))
    // and the rank statistic itself matches percentile_disc semantics:
    // p50 of each group is a real value with >= 50% of rows at or below
    val got = IncrementalAgg.histQuantiles(rebuild, keys, "v", _ / 8d, qs)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((g, p50) <- got) {
      val vals = data.filter($"g" === g).select($"v").collect().map(_.getDouble(0)).sorted
      assert(vals(math.ceil(vals.length * 0.5).toInt - 1) === p50, s"group $g")
    }
  }

  test("reserved working columns are rejected up front") {
    val bad = Seq(("a", 1d, 1L, 1L)).toDF("g", "v", "__pb", "w")
    val ex = intercept[IllegalArgumentException] {
      PrefixScan.inclusive(bad, Seq("g"), "v", Nil, "w", _ / 2d, "cum")
    }
    assert(ex.getMessage.contains("reserved"))
  }
}
