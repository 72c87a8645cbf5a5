package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpecBase {

  test("end-to-end prepare: quality gate drops degenerates, exact dups and " +
    "planted near-dups collapse to min representatives, counts are monotone") {
    val s = spark
    import s.implicits._
    val base = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    val corpus = base
      // exact copies of every 7th doc
      .unionByName(base.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 200000).as("doc_id"), $"text"))
      // near-copies (two words clipped) of every 5th doc
      .unionByName(base.filter($"doc_id" % 5 === 0).select(
        ($"doc_id" + 100000).as("doc_id"),
        concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text")))
      // degenerate rows the quality gate must drop
      .unionByName(Seq(
        (900001L, "short"),
        (900002L, ("x" * 900) + " " + ("y" * 900))).toDF("doc_id", "text"))

    val prep = CorpusPipeline.prepare(corpus, "doc_id", "text")
    val kept = prep.result.select($"doc_id").as[Long].collect().toSet
    val counts = prep.counts()

    assert(counts("input") === corpus.count())
    assert(counts("input") > counts("quality"), "quality gate dropped nothing")
    assert(counts("quality") > counts("exact_dedup"), "exact dedup dropped nothing")
    assert(counts("exact_dedup") > counts("near_dedup"), "near dedup dropped nothing")
    assert(counts("near_dedup") === kept.size.toLong)

    // degenerates gone
    assert(!kept.contains(900001L) && !kept.contains(900002L))
    // every exact copy lost to its original (min id wins)
    assert(!kept.exists(_ >= 200000L))
    // near-dup copies collapse to the original side at >= 90% recall
    // (the LSH operator's contract — banding misses a small tail)
    val plantedNear = corpus.filter($"doc_id" >= 100000L && $"doc_id" < 200000L)
      .count()
    val survivingNear = kept.count(k => k >= 100000L && k < 200000L)
    assert(plantedNear > 0 && survivingNear <= plantedNear / 10,
      s"$survivingNear of $plantedNear planted near-dups survived")
    // and originals survived
    assert(kept.contains(5L) || kept.contains(10L))
    // token accounting rode out on the result
    val t = prep.result.filter($"doc_id" === kept.head)
      .select($"n_tokens").as[Int].head()
    assert(t > 0)
  }
}
