package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The V2 WRITE stack: Spark must satisfy the distribution + ordering
  * the Write declares (clustered on routing, sorted by the sort column
  * within each writer task), and the two-phase commit must round-trip
  * the rows. */
class GraftIndexSourceSpec extends SparkSpecBase {

  private val fmt = "graft.sources.GraftIndexSource"

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    // doc_id = (id * 7919) % n is a permutation (gcd(7919, n) = 1 for the
    // n used here): deterministic but UNSORTED input, so the declared
    // ordering is genuinely Spark's work, not luck.
    s.range(n).select(
      (($"id" * 7919) % n).as("doc_id"),
      concat(lit("lang"), $"id" % 5).as("lang"),
      md5($"id".cast("string")).as("text"))
  }

  test("write plans the declared clustered distribution + in-task sort; " +
    "read round-trips; append and truncate behave") {
    val name = s"idx_spec_${System.nanoTime()}"
    try {
      val n = 500
      val df = corpus(n)
      df.write.format(fmt)
        .option("name", name).option("routing", "lang").option("sort", "doc_id")
        .option("shards", "4")
        .mode("overwrite").save()

      // round-trip values
      val back = spark.read.format(fmt).option("name", name).load()
      assert(back.count() == n)
      val expect = df.collect().map(_.toSeq).toSet
      assert(back.collect().map(_.toSeq).toSet === expect)

      // distribution evidence: every routing key was seen by EXACTLY one
      // writer task (Distributions.clustered), across >1 task, and every
      // task received its rows already sorted by doc_id (requiredOrdering)
      val ev = GraftIndexStore.evidenceOf(name)
      assert(ev.nonEmpty)
      val keyToParts = ev.flatMap(e => e.routingSeen.map(_ -> e.partitionId))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
      assert(keyToParts.keySet === (0 until 5).map(i => s"lang$i").toSet)
      assert(keyToParts.values.forall(_.size == 1), keyToParts.toString)
      // requiredNumPartitions = 4 shards, exactly (AQE must not coalesce)
      assert(ev.map(_.partitionId).distinct.size == 4)
      assert(ev.forall(_.arrivedSorted))

      // append accumulates, overwrite truncates
      df.write.format(fmt).option("name", name).option("routing", "lang")
        .option("sort", "doc_id").mode("append").save()
      assert(spark.read.format(fmt).option("name", name).load().count() == 2L * n)
      df.write.format(fmt).option("name", name).option("routing", "lang")
        .option("sort", "doc_id").mode("overwrite").save()
      assert(spark.read.format(fmt).option("name", name).load().count() == n)
    } finally GraftIndexStore.drop(name)
  }
}
