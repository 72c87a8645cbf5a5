package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {

  /** Scala reference: interleave bits of x into even, y into odd. */
  private def refZ(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= (x.toLong >> i & 1L) << (2 * i)
      z |= (y.toLong >> i & 1L) << (2 * i + 1)
    }
    z
  }

  test("column-math interleave matches the bitwise reference") {
    val s = spark
    import s.implicits._
    val samples = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (0xABCD, 0x1234),
      (42, 31337), (255, 256))
    val got = samples.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave($"x", $"y").as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === refZ(x, y), s"($x,$y)") }
  }

  /** Per-file normalized min/max width of `c` after writing `df`. */
  private def fileWidths(df: DataFrame, out: String, c: String): Array[Double] = {
    val s = spark
    import s.implicits._
    df.write.mode("overwrite").parquet(out)
    val back = s.read.parquet(out)
      .groupBy(input_file_name()).agg(
        min(col(c).cast("double")).as("mn"), max(col(c).cast("double")).as("mx"))
    val Array(gmn, gmx) = back.agg(min($"mn"), max($"mx"))
      .as[(Double, Double)].collect().map(t => Array(t._1, t._2)).head
    back.select(($"mx" - $"mn") / (gmx - gmn)).as[Double].collect()
  }

  test("clustering an empty frame is a no-op, not an NPE") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    assert(ZOrder.cluster(empty, "a", "b", 4).count() === 0L)
  }

  test("z-ordered files bound BOTH columns' ranges; a single-column sort " +
    "leaves the second column unpruned (full-range files)") {
    val s = spark
    val orders = Tables(s, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    val dir = Files.createTempDirectory("graft_zorder").toString

    val zed = ZOrder.cluster(orders, "o_custkey", "o_totalprice", numFiles = 16)
    val zCust = fileWidths(zed, s"$dir/z", "o_custkey")
    val zPrice = fileWidths(zed, s"$dir/z", "o_totalprice")

    val linear = orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
    val linPrice = fileWidths(linear, s"$dir/lin", "o_totalprice")

    def avg(a: Array[Double]) = a.sum / a.length
    // z-order: every file's box is a fraction of each dimension
    assert(avg(zCust) < 0.6, s"custkey widths: ${avg(zCust)}")
    assert(avg(zPrice) < 0.6, s"price widths: ${avg(zPrice)}")
    // custkey-sorted layout: price is uniform per file -> ~full range
    assert(avg(linPrice) > 0.8, s"linear price widths: ${avg(linPrice)}")
  }

  test("a second-column-only predicate touches a fraction of z-ordered " +
    "files but every single-column-sorted file") {
    val s = spark
    import s.implicits._
    val orders = Tables(s, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    val dir = Files.createTempDirectory("graft_zprune").toString
    ZOrder.cluster(orders, "o_custkey", "o_totalprice", 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(s"$dir/lin")

    // central ~25% band of the price range, price-only predicate
    val (lo, hi) = orders.agg(min($"o_totalprice"), max($"o_totalprice"))
      .as[(Double, Double)].collect().map(t => (t._1 + (t._2 - t._1) * 0.4,
        t._1 + (t._2 - t._1) * 0.6)).head
    def filesTouched(path: String): Long =
      s.read.parquet(path).filter($"o_totalprice".between(lo, hi))
        .select(input_file_name()).distinct().count()
    val z = filesTouched(s"$dir/z")
    val lin = filesTouched(s"$dir/lin")
    assert(lin >= 14, s"price band should hit ~all 16 linear files, got $lin")
    assert(z <= 10 && z < lin, s"z-order should localize the band: $z vs $lin")
  }
}
