package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.core.Barriers._

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
  * HOT-CELL SALTING (city-hotspot skew — MinHashLSH's viral-bucket
  * failure mode wearing coordinates): a cell with n points puts all n
  * home rows on ONE reducer. Cells exceeding `maxCellSize` are split
  * into g = ceil(n / maxCellSize) salt groups by key hash on the home
  * side; the probe side replicates each probe across all g salts of
  * its TARGET cell, so every (probe, home) pair still meets exactly
  * once and the pair set is IDENTICAL to the unsalted join — this caps
  * per-task fan-in, unlike the LSH drop-cap, because proximity pairs
  * are the operator's actual answer and may not be discarded. The
  * hot-cell table (cells with n > maxCellSize — hotspots are few by
  * nature) broadcasts; cold cells pay one broadcast-join lookup and
  * keep g = 1. The output pair count within a hotspot is still
  * inherently O(n²) — salting distributes that work, it cannot shrink
  * the answer; budget output volume accordingly.
  *
  * Scale shape: shuffle = 9× point keys on the probe side (×g for
  * probes aimed at hot cells), 1× on the home side — linear in points,
  * never quadratic. Longitude wrap at ±180° is not stitched
  * (curated-extent assumption, documented).
  */
object SpatialJoin {

  val DefaultMaxCell = 4096

  /** All pairs (a_key < b_key) of `points` within `radiusDeg`, with
    * their exact squared-degree distance.
    * @param points (keyCol, latCol, lonCol)
    * @param maxCellSize home rows per reducer bucket before a cell is
    *   salt-split (bounds task fan-in; never changes the result) */
  def withinRadius(points: DataFrame, keyCol: String,
                   latCol: String, lonCol: String,
                   radiusDeg: Double,
                   maxCellSize: Int = DefaultMaxCell): DataFrame = {
    val p = points.select(
      col(keyCol).as("k"), col(latCol).as("lat"), col(lonCol).as("lon"),
      floor(col(latCol) / radiusDeg).cast("long").as("cx"),
      floor(col(lonCol) / radiusDeg).cast("long").as("cy"))
    // Lazy localCheckpoint: the hot-cell table feeds BOTH broadcast
    // sites below, and the planner provably does not canonicalize the
    // two broadcast subtrees to one (measured — the aggregation ran
    // twice); checkpointing materializes the tiny table once on first
    // use and the second broadcast reads the same blocks. Non-eager, so
    // building the query plan stays job-free.
    val hot = hotCells(p, maxCellSize).barrier(eager = false)
    val home = p.join(broadcast(hot), Seq("cx", "cy"), "left")
      .withColumn("__g", coalesce(col("g"), lit(1L)))
      .withColumn("__salt", pmod(xxhash64(col("k")), col("__g")))
      .drop("n", "g")
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes0 = p.select(
        col("k").as("a_key"), col("lat").as("alat"), col("lon").as("alon"),
        col("cx"), col("cy"), explode(offsets).as("o"))
      .select(col("a_key"), col("alat"), col("alon"),
        (col("cx") + col("o.dx")).as("px"), (col("cy") + col("o.dy")).as("py"))
    // fan the probe across the TARGET cell's salt groups (1 for cold);
    // the rename happens in the join condition so both sides share the
    // one checkpointed `hot`
    val probes = probes0
      .join(broadcast(hot),
        probes0("px") === hot("cx") && probes0("py") === hot("cy"), "left")
      .withColumn("__salt", explode(sequence(lit(0L), coalesce(col("g"), lit(1L)) - 1)))
      .drop("cx", "cy", "n", "g")
    val d2 = Geo.degreeDistSq(col("alat"), col("alon"), col("lat"), col("lon"))
    probes.join(home,
        probes("px") === home("cx") && probes("py") === home("cy") &&
          probes("__salt") === home("__salt") &&
          probes("a_key") < home("k"))
      .filter(d2 < lit(radiusDeg * radiusDeg))
      .select(col("a_key"), col("k").as("b_key"), d2.as("dist_sq"))
  }

  /** Cells whose occupancy exceeds the cap, with their salt-group count
    * g = ceil(n / maxCellSize). Hotspots are few, so this broadcasts;
    * also the observability surface (alarm on large g — it means a
    * quadratic pair volume is coming out of that cell). */
  def hotCells(p: DataFrame, maxCellSize: Int): DataFrame =
    p.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCellSize)
      .withColumn("g", ceil(col("n") / lit(maxCellSize.toDouble)).cast("long"))
}
