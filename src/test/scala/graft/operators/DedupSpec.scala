package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Recall properties of the approximate dedup operators on planted
  * near-dups (exact-output checks are the DuckDB oracle's job —
  * q54-q57; here we assert the LSH machinery finds what it must). */
class DedupSpec extends SparkSpecBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    val d = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    d.unionByName(d.filter($"doc_id" % 5 === 0).select(
      ($"doc_id" + 100000).as("doc_id"),
      concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text")))
  }

  test("minhash-LSH recovers >= 90% of planted near-dup pairs") {
    val s = spark
    import s.implicits._
    val planted = docs.filter($"doc_id" >= 100000).select(($"doc_id" - 100000).as("a_id")).collect().map(_.getLong(0)).toSet
    val found = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 0.5)
      .filter($"b_id" === $"a_id" + 100000)
      .select($"a_id").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    assert(found.intersect(planted).size >= planted.size * 0.9,
      s"recall ${found.intersect(planted).size}/${planted.size}")
  }

  test("identical texts have simhash hamming distance 0") {
    val s = spark
    import s.implicits._
    val two = Seq((1L, "spark merge fast table"), (2L, "spark merge fast table")).toDF("doc_id", "text")
    val tf = two.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val out = SimHash.nearDupPairs(
      SimHash.fingerprints(tf, "doc_id", "term", "tf"), "doc_id", maxHamming = 0)
      .collect()
    assert(out.length === 1 && out.head.getAs[Any]("hamming") == 0)
  }

  test("sign-LSH: a rescaled vector keeps its bucket (scale invariance)") {
    val s = spark
    import s.implicits._
    val e = s.read.parquet(s"$sf/embeddings.parquet").select($"vec_id", $"embedding")
    val moved = e.select(
      SignLSH.bucket($"embedding").as("orig"),
      SignLSH.bucket(transform($"embedding", x => (x.cast("double") * 0.999).cast("float"))).as("scaled"))
      .filter($"orig" =!= $"scaled").count()
    // float re-rounding can flip a razor-thin sign; must be rare
    assert(moved <= e.count() / 50, s"$moved bucket moves")
  }

  test("sign-LSH near-dup pairs recover >= 90% of planted rescaled copies") {
    val s = spark
    import s.implicits._
    val e = s.read.parquet(s"$sf/embeddings.parquet").select($"vec_id", $"embedding")
    val planted = e.filter($"vec_id" % 5 === 0).select(
      ($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => (x.cast("double") * 0.999).cast("float")).as("embedding"))
    val n = planted.count()
    val found = SignLSH.nearDupPairs(e.unionByName(planted), "vec_id", "embedding", 0.999)
      .filter($"b_id" === $"a_id" + 100000).count()
    assert(n > 0 && found >= n * 0.9, s"recall $found/$n")
  }
}
