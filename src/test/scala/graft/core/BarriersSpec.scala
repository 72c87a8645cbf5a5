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

  test("every iterative operator family — star CC, PageRank, BFS, k-core " +
    "peel, winnowing — runs unchanged in reliable-checkpoint mode and is " +
    "result-identical to local mode (r8 verdict item 5)") {
    val s = spark
    import s.implicits._
    // a chain + a triangle + a tail: multiple rounds for every operator
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L), (11L, 12L), (12L, 10L),
      (10L, 13L)).toDF("src", "dst")
    val nodes = edges.select($"src".as("id"))
      .unionByName(edges.select($"dst".as("id"))).distinct()
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 50 && $"text".isNotNull).select($"doc_id", $"text")
    val ops: Seq[(String, () => Set[String])] = Seq(
      "labelStar" -> (() => graft.operators.ConnectedComponents
        .labelStar(nodes, "id", edges, "src", "dst")
        .collect().map(_.toSeq.mkString(",")).toSet),
      "pageRank" -> (() => graft.operators.PageRank
        .ranksMicro(nodes, "id", edges, "src", "dst", iters = 3)
        .collect().map(_.toSeq.mkString(",")).toSet),
      "bfs" -> (() => graft.operators.Bfs
        .distances(Seq(1L).toDF("id"), "id", edges, "src", "dst", maxHops = 5)
        .collect().map(_.toSeq.mkString(",")).toSet),
      "kcore" -> (() => graft.operators.KCore
        .peel(edges, "src", "dst", k = 2, maxRounds = 10)
        .collect().map(_.toSeq.mkString(",")).toSet),
      "winnowing" -> (() => graft.operators.Winnowing
        .fingerprintRows(docs, "doc_id", "text")
        .collect().map(_.toSeq.mkString(",")).toSet))
    spark.conf.unset(Barriers.ReliableKey)
    val t0 = System.nanoTime()
    val local = ops.map { case (n, f) => n -> f() }
    val localMs = (System.nanoTime() - t0) / 1000000
    local.foreach { case (n, r) => assert(r.nonEmpty, s"$n empty in local mode") }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-iter").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Barriers.ReliableKey, "true")
    try {
      val t1 = System.nanoTime()
      ops.zip(local).foreach { case ((n, f), (_, expected)) =>
        assert(f() === expected, s"$n diverged in reliable mode")
      }
      val reliableMs = (System.nanoTime() - t1) / 1000000
      info(s"local=$localMs ms reliable=$reliableMs ms " +
        f"(overhead ${reliableMs.toDouble / localMs}%.2fx on this tiny graph)")
    } finally spark.conf.unset(Barriers.ReliableKey)
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
