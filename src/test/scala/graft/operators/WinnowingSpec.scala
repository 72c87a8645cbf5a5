package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Winnowing's paper guarantees on constructed token runs (the exact
  * per-doc fingerprint values are the q95 DuckDB oracle's job). */
class WinnowingSpec extends SparkSpecBase {

  private val k = 4
  private val w = 4

  private def fpSets(texts: Seq[String]): Map[Int, Set[Long]] = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select($"id", Winnowing.fingerprints($"text", k, w).as("fps"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toSet)
      .toMap
  }

  test("documents sharing a run of >= w+k-1 tokens share a fingerprint") {
    // 7-token shared run (= w+k-1) embedded in different surroundings.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val m = fpSets(Seq(
      s"one two three $shared four five six",
      s"red green blue $shared purple orange pink"))
    assert(m(0).intersect(m(1)).nonEmpty,
      s"guarantee violated: ${m(0)} vs ${m(1)}")
  }

  test("no fingerprint is shared when no k-gram is shared") {
    val m = fpSets(Seq(
      "a b c d e f g h i j",
      "q r s t u v w x y z"))
    assert(m(0).intersect(m(1)).isEmpty)
  }

  test("short documents yield an empty set; density stays below the gram count") {
    val s = spark
    import s.implicits._
    val m = fpSets(Seq("a b c d e f", "one two three"))
    assert(m(0).isEmpty && m(1).isEmpty) // < k+w-1 tokens: window can't fit
    val doc = (1 to 200).map(i => s"t${i % 50}").mkString(" ")
    val Seq((nFp, nGrams)) = Seq(doc).toDF("text")
      .select(size(Winnowing.fingerprints($"text", k, w)).as("n"),
        size(MinHashLSH.shinglesFromHashes(
          MinHashLSH.tokenHashes($"text"), k)).as("g"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1)))
    assert(nFp > 0 && nFp < nGrams, s"density: $nFp of $nGrams grams")
  }

  test("fingerprints are order-sensitive (unlike minhash sets)") {
    val m = fpSets(Seq(
      "a1 b2 c3 d4 e5 f6 g7 h8 i9 j10",
      "j10 i9 h8 g7 f6 e5 d4 c3 b2 a1"))
    assert(m(0) != m(1))
  }

  test("the relational fingerprintRows form equals the HOF column form " +
    "on real corpus documents (including too-short docs)") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(60)
      .unionByName(Seq((900L, "one two three")).toDF("doc_id", "text"))
    val viaHof = docs
      .select($"doc_id", explode(Winnowing.fingerprints($"text", k, w)).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaRows = Winnowing.fingerprintRows(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRows === viaHof)
    assert(!viaRows.exists(_._1 == 900L)) // short doc: no full window
  }
}
