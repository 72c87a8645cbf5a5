package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X109m pins for [[PostingsUpdate]] (q305):
  *  - updated ≡ from-scratch build over the post-update corpus, byte
  *    for byte (the composition law the oracle also gates);
  *  - the UPSERT half: an id not in the store inserts cleanly;
  *  - idempotence: updating to IDENTICAL text leaves every block
  *    byte-identical (canonical coding);
  *  - untouched blocks (buckets holding no updated id, terms the new
  *    text doesn't add) pass through byte-identical.
  */
class PostingsUpdateSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = (0L until 250L).map(i =>
    (i, s"hot w${i % 9} x${i % 4} hot"))
  private def store(rows: Seq[(Long, String)]) =
    graft.queries.Text.postingStore(rows.toDF("doc_id", "text"))
  private def bytesByKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getInt(2), r.getAs[Array[Byte]](3).toSeq)).toMap

  test("updated == from-scratch build over the post-update corpus, " +
    "byte for byte") {
    val updated = corpus.filter(_._1 % 6 == 2)
      .map { case (i, _) => (i, s"fresh u${i % 3} hot") }
    val got = bytesByKey(PostingsUpdate(
      store(corpus), updated.toDF("doc_id", "text")))
    val post = corpus.map { case (i, t) =>
      (i, if (i % 6 == 2) s"fresh u${i % 3} hot" else t)
    }
    assert(got === bytesByKey(store(post)),
      "updated store != rebuild over post-update corpus")
  }

  test("upsert: an id not in the store inserts cleanly") {
    val got = bytesByKey(PostingsUpdate(
      store(corpus), Seq((999L, "hot novel")).toDF("doc_id", "text")))
    assert(got === bytesByKey(store(corpus :+ (999L, "hot novel"))))
  }

  test("idempotence: updating to identical text changes no block") {
    val base = bytesByKey(store(corpus))
    val same = corpus.filter(_._1 % 6 == 2)
    val got = bytesByKey(PostingsUpdate(
      store(corpus), same.toDF("doc_id", "text")))
    assert(got === base, "identical-text update changed a block")
  }

  test("untouched blocks pass through byte-identical") {
    val base = bytesByKey(store(corpus))
    // one updated id in bucket 1 only
    val got = bytesByKey(PostingsUpdate(
      store(corpus), Seq((150L, "hot changed")).toDF("doc_id", "text")))
    for ((k, v) <- base if k._2 != 1L)
      assert(got(k) === v, s"untouched block $k changed")
  }
}
