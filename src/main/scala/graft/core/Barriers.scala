package graft.core

import org.apache.spark.sql.DataFrame

/** Materialization barriers for iterative and multi-consumer frames
  * (ADVICE r8 — the fault-tolerance knob for the library's
  * `localCheckpoint` barriers).
  *
  * Every iterative operator here (ConnectedComponents, Bfs, PageRank,
  * KCore, KMeansInt, ProductQuantizer, BpeVocab) and every
  * multi-consumer pipeline stage (Winnowing, SemDeDup, the dedup and
  * corpus pipelines) needs a point where lineage is CUT — without it,
  * round N's plan nests every prior round's join (analysis cost grows
  * quadratically and the optimizer re-plans the world each round), and
  * a frame consumed twice replays its whole upstream per consumer.
  * `persist()` alone does not cut lineage, and an `orderBy` on a
  * persisted frame still replays upstream stages for its range-
  * partition sampling pass.
  *
  * The default barrier is `localCheckpoint`: blocks live on executors
  * only, which on a single JVM (this test environment) is free, but on
  * a cluster means ANY executor loss makes the checkpointed blocks
  * unrecoverable and fails the job — lineage was truncated, so Spark
  * cannot recompute them. For cluster deployments set
  *
  *   spark.graft.reliableCheckpoints = true
  *
  * (plus `SparkContext.setCheckpointDir` to a durable FS, e.g. HDFS/S3)
  * and every `.barrier()` in the library becomes a reliable
  * `checkpoint()`: one extra write+read of the barriered frame buys
  * executor-loss recovery — the right trade at 100 TB where a
  * multi-hour job losing an executor is a WHEN, not an IF.
  *
  * Measured overhead (BarriersSpec, r9): running star CC + PageRank +
  * BFS + k-core + winnowing back-to-back in reliable mode on the spec
  * graphs is within measurement noise of local mode (the reliable
  * sitting even measured 0.82× because it ran second on a warm JVM) —
  * at test scale the barriered frames are KBs, so the extra
  * write+read is invisible. The structural cost that DOES appear at
  * corpus scale is one durable-FS write + read of each barriered
  * frame per round; iterative operators barrier only k·dims-long
  * centroid/label tables (never the corpus), so the per-round tax
  * stays proportional to the STATE, not the data.
  */
object Barriers {

  val ReliableKey = "spark.graft.reliableCheckpoints"

  implicit final class BarrierOps(private val df: DataFrame) extends AnyVal {

    /** Cut lineage and materialize (eagerly unless `eager = false`).
      * Honors [[ReliableKey]]; requires a checkpoint dir when reliable
      * mode is on (failing loud beats silently degrading the promised
      * fault tolerance back to local blocks). */
    def barrier(eager: Boolean = true): DataFrame = {
      val spark = df.sparkSession
      val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
      if (reliable) {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ReliableKey=true but no checkpoint dir: call " +
            "SparkContext.setCheckpointDir to a durable filesystem first")
        df.checkpoint(eager)
      } else df.localCheckpoint(eager)
    }
  }
}
