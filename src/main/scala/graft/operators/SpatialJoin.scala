package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Cell-bucketed spatial proximity join (SURVEY.md §2.3 J12) — all
  * point pairs within a radius, without the O(n²) cross product: the
  * geohash/grid pattern every spatial engine uses, expressed as one
  * equi-join.
  *
  * Each point lands in a `radius`-sized grid cell; a pair within
  * `radius` can differ by at most one cell index per axis, so the
  * PROBE side replicates each point into its 3×3 cell neighborhood and
  * equi-joins against the other side's HOME cell. Each candidate pair
  * arises from exactly one (dx, dy) offset — no dedup pass — and the
  * exact `degreeDistSq` predicate scrubs the corner candidates. The
  * squared-degree metric is pure arithmetic (oracle-safe, q76's
  * choice); swap the verify predicate for haversine when true meters
  * matter (candidate generation is unchanged — the grid bound holds
  * for any metric dominated by the equirectangular box).
  *
  * Scale shape: shuffle = 9× point keys on the probe side, 1× on the
  * home side — linear in points, never quadratic. Join fan-out is
  * bounded by real point density per cell; for city-hotspot skew, cap
  * or salt hot cells exactly like MinHashLSH's viral buckets (the same
  * failure mode wearing coordinates). Longitude wrap at ±180° is not
  * stitched (curated-extent assumption, documented).
  */
object SpatialJoin {

  /** All pairs (a_key < b_key) of `points` within `radiusDeg`, with
    * their exact squared-degree distance.
    * @param points (keyCol, latCol, lonCol) */
  def withinRadius(points: DataFrame, keyCol: String,
                   latCol: String, lonCol: String,
                   radiusDeg: Double): DataFrame = {
    val p = points.select(
      col(keyCol).as("k"), col(latCol).as("lat"), col(lonCol).as("lon"),
      floor(col(latCol) / radiusDeg).cast("long").as("cx"),
      floor(col(lonCol) / radiusDeg).cast("long").as("cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes = p.select(
        col("k").as("a_key"), col("lat").as("alat"), col("lon").as("alon"),
        col("cx"), col("cy"), explode(offsets).as("o"))
      .select(col("a_key"), col("alat"), col("alon"),
        (col("cx") + col("o.dx")).as("px"), (col("cy") + col("o.dy")).as("py"))
    val d2 = Geo.degreeDistSq(col("alat"), col("alon"), col("lat"), col("lon"))
    probes.join(p,
        probes("px") === p("cx") && probes("py") === p("cy") &&
          probes("a_key") < p("k"))
      .filter(d2 < lit(radiusDeg * radiusDeg))
      .select(col("a_key"), col("k").as("b_key"), d2.as("dist_sq"))
  }
}
