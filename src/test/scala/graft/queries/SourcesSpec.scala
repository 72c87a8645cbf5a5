package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import java.util.concurrent.atomic.AtomicInteger
import graft.SparkSpecBase

/** Laws for the schema-evolution read paths (S14): the pinned-schema
  * fast path must agree value-for-value with mergeSchema discovery,
  * and must not run the footer-union inference job — at 25M files the
  * inference job IS the cost. */
class SourcesSpec extends SparkSpecBase {

  private def jobsDuring[A](body: => A): (A, Int) = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { n.incrementAndGet(): Unit }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener delivery is async; give the bus time to drain
      Thread.sleep(1000)
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pinned evolved read equals the mergeSchema read value-for-value") {
    val (v1, v2) = Sources.writeEvolvedGenerations(spark, sf)
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq.map(x => Option(x).map(_.toString).orNull)).toSet
    val merged = canon(Sources.mergedEvolvedRead(spark, v1, v2)
      .select("doc_id", "lang", "n_chars", "source"))
    val pinned = canon(Sources.pinnedEvolvedRead(spark, Sources.evolvedSchema, v1, v2)
      .select("doc_id", "lang", "n_chars", "source"))
    assert(pinned === merged)
    assert(pinned.nonEmpty)
  }

  test("pinned read plans ZERO jobs before the action; mergeSchema runs " +
    "its footer-union inference job at read time") {
    val (v1, v2) = Sources.writeEvolvedGenerations(spark, sf)
    val (_, pinnedJobs) = jobsDuring {
      Sources.pinnedEvolvedRead(spark, Sources.evolvedSchema, v1, v2).schema
    }
    assert(pinnedJobs === 0, "pinned-schema read must not launch inference jobs")
    val (_, mergedJobs) = jobsDuring {
      Sources.mergedEvolvedRead(spark, v1, v2).schema
    }
    assert(mergedJobs >= 1, "mergeSchema discovery is expected to cost a job " +
      "(if this ever becomes free, the pinned path loses its reason to exist)")
  }
}
