package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X109d segment-merge pins: merged segments equal a from-scratch
  * build BYTE FOR BYTE even when the segments' doc ids interleave
  * inside one bucket; the fold absorbs any segment count; overlapping
  * doc ids (a posting stored twice) throw instead of silently
  * double-counting.
  */
class IndexSegmentMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def store(rows: Seq[(Long, String)]) =
    graft.queries.Text.postingStore(rows.toDF("doc_id", "text"))

  private def bytesByKey(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.getString(0), r.getLong(1)) ->
      (r.getInt(2), r.getAs[Array[Byte]]("bytes").toSeq)).toMap

  // 'hot' in every doc; even/odd ids interleave within bucket 0
  private val corpus = (0L until 150L).map(i => (i, s"hot w$i hot"))

  test("merge(base, delta) == from-scratch build, byte for byte, with " +
    "interleaved doc ids across segments") {
    val base = store(corpus.filter(_._1 % 2 == 0))
    val delta = store(corpus.filter(_._1 % 2 == 1))
    val merged = bytesByKey(IndexSegmentMerge.merge(base, delta))
    val full = bytesByKey(store(corpus))
    assert(merged === full)
  }

  test("three-way fold: merge(merge(a, b), c) == full build") {
    val a = store(corpus.filter(_._1 % 3 == 0))
    val b = store(corpus.filter(_._1 % 3 == 1))
    val c = store(corpus.filter(_._1 % 3 == 2))
    val merged = bytesByKey(
      IndexSegmentMerge.merge(IndexSegmentMerge.merge(a, b), c))
    assert(merged === bytesByKey(store(corpus)))
  }

  test("overlapping doc ids between segments THROW (a merge must never " +
    "silently duplicate a posting)") {
    val base = store(corpus)
    val dup = store(corpus.take(5)) // same docs again
    val e = intercept[Exception] {
      IndexSegmentMerge.merge(base, dup).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).map(_.toString).mkString(" | ")
    assert(chain.contains("overlapping doc ids"), chain)
  }
}
