package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ExactSubstr (q191/q192) semantics on hand fixtures — span discovery,
  * island merging, and the scrub row contract (exact corpus outputs are
  * the DuckDB oracle's job). */
class ExactSubstrSpec extends SparkSpecBase {

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int) =
    ExactSubstr.duplicatedSpans(df, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("cross-doc shared run and exact copy localize to the right spans") {
    val df = corpus(
      1L -> "a b c d e f g h",
      2L -> "x1 x2 c d e f x3 x4",
      3L -> "u v w",
      4L -> "a b c d e f g h")
    // doc1 == doc4: every 4-gram duplicated -> full [1,8]; doc2 shares
    // exactly "c d e f" at pos 3; doc3 is sub-k (no grams at all)
    assert(spans(df, 4) === Set((1L, 1L, 8L), (4L, 1L, 8L), (2L, 3L, 6L)))
  }

  test("islands merge across gaps <= k (within-doc repeat bridges)") {
    // "p q r s" and "q r s t" each occur at two starts {1,6}/{2,7};
    // gap 6-2=4 <= k merges everything into one span covering the doc
    val df = corpus(5L -> "p q r s t p q r s t")
    assert(spans(df, 4) === Set((5L, 1L, 10L)))
  }

  test("disjoint duplicated runs separated by > k unique tokens stay " +
    "separate spans") {
    val df = corpus(
      6L -> "a b c d u1 u2 u3 u4 u5 e f g h",
      7L -> "a b c d z1 z2 z3 z4 z5 e f g h")
    // shared 4-grams start at pos 1 and pos 10 in both docs; gap 9 > 4
    assert(spans(df, 4) ===
      Set((6L, 1L, 4L), (6L, 10L, 13L), (7L, 1L, 4L), (7L, 10L, 13L)))
  }

  test("scrub keeps every row: sub-k doc untouched, covered doc empty, " +
    "partial doc reassembled in order") {
    val df = corpus(
      1L -> "a b c d e f g h",
      2L -> "x1 x2 c d e f x3 x4",
      3L -> "u v w",
      4L -> "a b c d e f g h")
    val out = ExactSubstr.scrub(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L) === ((8L, 0L, "")))
    assert(out(4L) === ((8L, 0L, "")))
    assert(out(2L) === ((8L, 4L, "x1 x2 x3 x4")))
    assert(out(3L) === ((3L, 3L, "u v w")))
  }

  test("planted corpus: every prefix copy is fully covered and its " +
    "original keeps exactly its last 2 tokens") {
    val s = spark
    import s.implicits._
    val d = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    val planted = d.unionByName(d.filter($"doc_id" % 5 === 0).select(
      ($"doc_id" + 100000).as("doc_id"),
      concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text")))
    val scrubbed = ExactSubstr.scrub(planted, "doc_id", "text", 8)
    val copies = scrubbed.filter($"doc_id" >= 100000)
    assert(copies.count() > 0)
    assert(copies.filter($"n_kept" =!= 0L).count() === 0,
      "every planted prefix copy must scrub to empty")
    // originals of the copies keep at most their 2-token tail (natural
    // cross-doc repeats can only remove MORE)
    val origs = scrubbed.as("sc")
      .join(copies.select(($"doc_id" - 100000).as("doc_id")), "doc_id")
    assert(origs.filter($"n_kept" > 2).count() === 0)
  }
}
