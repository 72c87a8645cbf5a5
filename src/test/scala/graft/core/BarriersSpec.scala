package graft.core

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** The `.barrier()` knob (ADVICE r8): default = localCheckpoint
  * (single-JVM barrier), `spark.graft.reliableCheckpoints=true` =
  * reliable `checkpoint()` into the configured durable dir, and
  * reliable mode without a dir fails LOUD instead of silently
  * degrading the promised fault tolerance. */
class BarriersSpec extends SparkSpecBase {

  private def df = {
    val s = spark
    import s.implicits._
    (1 to 100).toDF("x").withColumn("y", col("x") * 2)
  }

  test("default barrier materializes without a checkpoint dir") {
    spark.conf.unset(Barriers.ReliableKey)
    val b = df.barrier()
    assert(b.agg(sum(col("y"))).collect().head.getLong(0) === 10100L)
    // lineage is cut: the barriered plan is a scan, not the projection
    assert(b.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
  }

  test("reliable mode without a checkpoint dir fails loud") {
    spark.conf.set(Barriers.ReliableKey, "true")
    try {
      val e = intercept[IllegalArgumentException] { df.barrier() }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset(Barriers.ReliableKey)
  }

  test("a real iterative operator (integer k-means) runs unchanged in " +
    "reliable mode and matches its local-mode result") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run() = graft.operators.KMeansInt
      .cluster(emb, "vec_id", "embedding", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-op").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Barriers.ReliableKey, "true")
    try assert(run() === local)
    finally spark.conf.unset(Barriers.ReliableKey)
  }

  test("reliable mode writes blocks into the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Barriers.ReliableKey, "true")
    try {
      val b = df.barrier()
      assert(b.agg(sum(col("y"))).collect().head.getLong(0) === 10100L)
      // reliable checkpoint persisted RDD blocks under the dir
      def files(p: java.io.File): Seq[java.io.File] = {
        val cs = Option(p.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty,
        "no checkpoint files written in reliable mode")
    } finally {
      spark.conf.unset(Barriers.ReliableKey)
    }
  }
}
