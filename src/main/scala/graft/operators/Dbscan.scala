package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-DBSCAN density clustering (SURVEY.md §2.11a X92; Ester et al.
  * '96) — the MR-DBSCAN data-parallel decomposition, every stage an
  * operator this library already ships. See the q211 scaladoc for the
  * full design story; the pieces live here so the batch query and the
  * streaming assignment path (T20) share one implementation.
  *
  * Determinism: border points adopt the MINIMUM cluster label among
  * their core neighbors — the tie the sequential region-growing
  * algorithm leaves order-dependent. Coordinates are expected to be
  * exact integers carried as doubles (integer-valued doubles are exact
  * to 2⁵³), so distance comparisons are bit-deterministic.
  */
object Dbscan {

  /** Full clustering: `(id, role 2=core/1=border/0=noise, cluster_id =
    * min core id in the cluster, −1 for noise)` for `pts(id, x, y)`. */
  def cluster(pts: DataFrame, eps: Double, minPts: Int): DataFrame = {
    import graft.core.Barriers._
    val pairs = SpatialJoin.withinRadius(pts, "id", "x", "y", eps)
      .select(col("a_key").as("p"), col("b_key").as("q"))
    val sym = pairs.unionAll(pairs.select(col("q").as("p"), col("p").as("q")))
      .barrier()
    val core = sym.groupBy(col("p")).agg(count(lit(1)).as("nbrs"))
      .filter(col("nbrs") >= minPts - 1).select(col("p").as("id"))
    val ce = sym
      .join(core.select(col("id").as("p")), "p")
      .join(core.select(col("id").as("q")), "q")
    val lab = ConnectedComponents.labelStar(core, "id", ce, "p", "q")
      .select(col("id"), col("component").as("cluster_id"))
    val borderLab = sym
      .join(lab.select(col("id").as("q"), col("cluster_id")), "q")
      .join(core.select(col("id").as("p")), Seq("p"), "left_anti")
      .groupBy(col("p")).agg(min(col("cluster_id")).as("cluster_id"))
      .select(col("p").as("id"), col("cluster_id"))
    val coreOut = lab.select(col("id"), lit(2).as("role"), col("cluster_id"))
    val borderOut = borderLab
      .select(col("id"), lit(1).as("role"), col("cluster_id"))
    val noise = pts.select(col("id"))
      .join(coreOut.select(col("id")), Seq("id"), "left_anti")
      .join(borderOut.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(0).as("role"), lit(-1L).as("cluster_id"))
    coreOut.unionAll(borderOut).unionAll(noise)
  }

  /** The frozen serving table for [[assign]]: labeled CORE points with
    * coordinates, exploded to their 3×3 ε-cell neighborhood so a new
    * point probes with ONE equi-join on its own cell. CACHE before
    * streaming against it (stream-static joins re-plan the static side
    * every micro-batch). */
  def coreTable(pts: DataFrame, eps: Double, minPts: Int): DataFrame = {
    val lab = cluster(pts, eps, minPts).filter(col("role") === 2)
      .select(col("id"), col("cluster_id"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    pts.join(lab, "id")
      .select(col("cluster_id"), col("x").as("cx_pt"), col("y").as("cy_pt"),
        floor(col("x") / eps).cast("long").as("gx"),
        floor(col("y") / eps).cast("long").as("gy"),
        explode(offsets).as("o"))
      .select(col("cluster_id"), col("cx_pt"), col("cy_pt"),
        (col("gx") + col("o.dx")).as("gx"), (col("gy") + col("o.dy")).as("gy"))
  }

  /** DBSCAN "predict": each row of `newPts(id, x, y)` (batch OR
    * streaming) gets the MINIMUM cluster label among frozen core
    * points within ε, or −1 (noise) if none — one stateless cell
    * projection, one equi-join on the cell key against [[coreTable]]
    * (stream-static legal; left outer keeps no-neighbor points), one
    * per-id min aggregate.
    *
    * The probe is deliberately ASYMMETRIC: new points join only on
    * their own home cell, with no 3×3 fan-out on this side — that is
    * correct because [[coreTable]] already explodes every core point
    * into all 9 neighbor cells, so any core point within ε of a new
    * point is guaranteed to appear under the new point's home-cell key.
    * Adding a probe-side fan-out here would double-count the
    * neighborhood, not fix anything. */
  def assign(newPts: DataFrame, core: DataFrame, eps: Double): DataFrame =
    newPts
      .select(col("id"), col("x"), col("y"),
        floor(col("x") / eps).cast("long").as("gx"),
        floor(col("y") / eps).cast("long").as("gy"))
      .join(core, Seq("gx", "gy"), "left_outer")
      .groupBy(col("id"))
      .agg(coalesce(min(when(
          (col("x") - col("cx_pt")) * (col("x") - col("cx_pt"))
            + (col("y") - col("cy_pt")) * (col("y") - col("cy_pt")) < eps * eps,
          col("cluster_id"))), lit(-1L)).as("cluster_id"))
}
