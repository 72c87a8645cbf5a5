package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Dbscan

/** Streaming side of the density clustering (SURVEY.md §2.9 T20 /
  * §2.11a X92): the clustering itself runs in BATCH
  * ([[Dbscan.cluster]] — a global fixed point over the whole corpus, a
  * thing a stream cannot compute incrementally without reopening every
  * past assignment), and live points are ASSIGNED against the frozen
  * labeled core set — DBSCAN's "predict" step, and the same
  * retrain-periodically / serve-continuously posture as T17/T18/T19.
  *
  * Shape: stateless cell projection per point, ONE stream-static left
  * join on the cell key against the 3×3-exploded core table, then an
  * UPDATE-mode per-id min aggregate (noise = −1 via coalesce — the
  * left join keeps points with no core cell in reach). CACHE the core
  * table before starting the query.
  */
object StreamingDbscanAssign {

  /** `(id, cluster_id)` updates for a streaming `(id, x, y)` frame
    * against a frozen [[Dbscan.coreTable]]; −1 = noise. */
  def assignStream(points: DataFrame, coreTable: DataFrame,
                   eps: Double): DataFrame =
    Dbscan.assign(points, coreTable, eps)
}
