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

  test("prepareSemantic: stage 4 prunes only embedding-judged docs — " +
    "counts stay monotone, a planted same-direction pair collapses to " +
    "its min id, and docs WITHOUT an embedding row pass through") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // corpus = documents plus one doc (900100) with NO embedding row;
    // embeddings plus a rescaled copy of vec 1's embedding under a new
    // id (900200) paired with a doc of unrelated text so only the
    // SEMANTIC stage can collapse it
    val extraDoc = Seq(
      (900100L, "a perfectly ordinary document with no embedding attached here"),
      (900200L, "unrelated wording that the syntactic stages will never collapse"))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(extraDoc)
    val extraEmb = emb.filter($"vec_id" === 1L)
      .select(lit(900200L).as("vec_id"),
        transform($"embedding", x => x * 0.5f).as("embedding"))
    val embAll = emb.unionByName(extraEmb)

    val p = CorpusPipeline.prepareSemantic(
      corpus, "doc_id", "text", embAll, "vec_id", "embedding",
      tau = 0.999999)
    val counts = p.counts()
    assert(counts("near_dedup") >= counts("semantic"),
      s"semantic stage grew the corpus: $counts")
    val kept = p.result.select($"doc_id").as[Long].collect().toSet
    assert(counts("semantic") === kept.size.toLong)
    // the no-embedding doc survives every stage (anti-join semantics)
    assert(kept.contains(900100L))
    // the rescaled same-direction copy (cos == 1 with vec 1) dropped to
    // its min-id original, which survived — at tau just under 1 the
    // isotropic fixture vectors never collide, so exactly this planted
    // pair exercises the stage
    assert(!kept.contains(900200L) && kept.contains(1L))
    assert(counts("near_dedup") - counts("semantic") === 1L)
  }
}
