package graft.queries

import graft.SparkSpecBase

/** X110d pins for q298 — BM25F multi-field ranking:
  *  - the field-weight DOMINANCE law on planted docs: equal tf, equal
  *    lengths, the title hit outranks the body hit (the reason BM25F
  *    exists);
  *  - single-saturation semantics: a doc with the term once in title
  *    AND once in body beats the title-only doc (more combined
  *    evidence) but by LESS than linearly — wtf saturates through one
  *    k1, not per field;
  *  - short docs (dl ≤ title width) have an empty body field and still
  *    serve.
  */
class Bm25fSpec extends SparkSpecBase {
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)],
      term: String): Map[Long, Long] =
    Retrieval.bm25fServe(docs.toDF("doc_id", "text"), Seq(term), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("dominance: a title hit outranks the identical hit in the body") {
    val filler = "w w w w w w w w w"
    val docs = Seq(
      (0L, s"apple $filler"),          // pos 1: title
      (1L, s"w w w w w w apple w w w") // pos 7: body, same dl=10, tf=1
    )
    val s = scores(docs, "apple")
    assert(s(0L) > s(1L),
      s"title hit ${s(0L)} must outrank body hit ${s(1L)}")
  }

  test("single saturation: title+body evidence beats title-only, " +
    "sublinearly") {
    val docs = Seq(
      (0L, "apple w w w w w w w w w"),       // wtf = 2
      (1L, "apple w w w w w apple w w w"),   // wtf = 2 + 1 = 3
      (2L, "pear w w w w w w w w w"))        // no hit — df denominator
    val s = scores(docs, "apple")
    assert(s(1L) > s(0L), "combined evidence must score higher")
    // saturation: tripling... wtf 2→3 is +50% evidence but the k1
    // form must grow by LESS than 50%
    assert((s(1L) - s(0L)).toDouble / s(0L) < 0.5,
      s"no saturation: ${s(0L)} -> ${s(1L)}")
  }

  test("a doc shorter than the title width has an empty body and serves") {
    val docs = Seq(
      (0L, "apple pie"),                 // dl = 2 < 5: all title
      (1L, "w w w w w w w apple w w"))
    val s = scores(docs, "apple")
    assert(s.contains(0L) && s.contains(1L))
    assert(s(0L) > s(1L), "the all-title short doc must rank first")
  }

  // ---- X110e (q307): BM25F x block-max ----

  test("fielded block-max: pruned == exhaustive BM25F on a skewed " +
    "corpus; every skipped bucket's ub < theta and no skipped doc " +
    "belongs to the true top-k") {
    // 600 docs / 6 buckets; bucket 0 is title-hit-rich (high ub),
    // most others carry only weak body hits — the skew pruning needs
    val docs = (0L until 600L).map { i =>
      val t =
        if (i < 80 && i % 2 == 0) s"apple w w w w w w w w w"  // title hit
        else if (i % 7 == 0) s"w w w w w w apple w w w"       // body hit
        else "w w w w w w w w w w"
      (i, t)
    }.toDF("doc_id", "text")
    val k = 10
    val probe = graft.operators.BlockMaxWand
      .probeFielded(docs, Seq("apple"), k, seedJ = 2)
    val got = probe.ranked.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Retrieval.bm25fServe(docs, Seq("apple"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "pruned fielded ranking != exhaustive q298 serve")
    // skip law: skipped = all buckets minus seeds minus survivors;
    // each skipped ub < theta, and no true-top-k doc lives in one
    val theta = probe.theta.collect()(0).getLong(0)
    val seeds = probe.seeds.collect().map(_.getLong(0)).toSet
    val survivors = probe.survivors.collect().map(_.getLong(0)).toSet
    val skipped = probe.bucketUb.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(b => seeds.contains(b._1) || survivors.contains(b._1))
    assert(skipped.nonEmpty, "nothing skipped — the pin is vacuous")
    skipped.foreach { case (b, ub) =>
      assert(ub < theta, s"bucket $b survived filtering with ub >= theta")
    }
    val skippedBuckets = skipped.map(_._1).toSet
    want.foreach { case (doc, _) =>
      assert(!skippedBuckets.contains(doc / 100),
        s"true top-$k doc $doc lived in a skipped bucket")
    }
  }
}
