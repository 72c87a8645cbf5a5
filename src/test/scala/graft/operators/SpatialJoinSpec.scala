package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.functions.Geo

/** Laws for the grid-cell spatial join's hot-cell salting: an
  * adversarial hotspot (everything in one cell) must neither explode a
  * single reducer bucket nor change the answer. */
class SpatialJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val R = 0.01
  // 300-point hotspot inside one R-cell + 60 scattered points
  private lazy val pts = {
    val rnd = new scala.util.Random(7)
    val hot = (1 to 300).map(i =>
      (i.toLong, 10.0005 + rnd.nextDouble() * 0.008, 20.0005 + rnd.nextDouble() * 0.008))
    val cold = (1 to 60).map(i =>
      (1000L + i, rnd.nextDouble() * 5, 30 + rnd.nextDouble() * 5))
    (hot ++ cold).toDF("k", "lat", "lon")
  }

  test("hotspot pair set is IDENTICAL to the brute-force join (salting " +
    "redistributes, never drops)") {
    val salted = SpatialJoin.withinRadius(pts, "k", "lat", "lon", R, maxCellSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = pts.select($"k".as("a_key"), $"lat".as("alat"), $"lon".as("alon"))
    val brute = a.crossJoin(pts).filter($"a_key" < $"k")
      .filter(Geo.degreeDistSq($"alat", $"alon", $"lat", $"lon") < lit(R * R))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(salted === brute)
    assert(salted.size > 1000) // the hotspot really is quadratic-dense
  }

  test("each pair is emitted exactly once (no dedup pass needed)") {
    val n = SpatialJoin.withinRadius(pts, "k", "lat", "lon", R, maxCellSize = 32).count()
    val d = SpatialJoin.withinRadius(pts, "k", "lat", "lon", R, maxCellSize = 32)
      .select("a_key", "b_key").distinct().count()
    assert(n === d)
  }

  test("hot cells report their salt-group count and home buckets stay " +
    "bounded near the cap") {
    val p = pts.select($"k", $"lat", $"lon",
      floor($"lat" / R).cast("long").as("cx"),
      floor($"lon" / R).cast("long").as("cy"))
    val hot = SpatialJoin.hotCells(p, maxCellSize = 32).collect()
    assert(hot.length === 1) // exactly the planted hotspot
    val g = hot.head.getAs[Long]("g")
    assert(g === math.ceil(300 / 32.0).toLong)
    // replicate the operator's salt assignment: the fattest home bucket
    // must be near n/g, nowhere near the unsalted 300
    val maxBucket = p.join(broadcast(SpatialJoin.hotCells(p, 32)), Seq("cx", "cy"))
      .withColumn("salt", pmod(xxhash64($"k"), $"g"))
      .groupBy($"cx", $"cy", $"salt").count()
      .agg(max($"count")).head().getLong(0)
    assert(maxBucket <= 64, s"fattest salted bucket $maxBucket")
  }
}
