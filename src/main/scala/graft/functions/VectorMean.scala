package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A10 — typed UDAF: dimension-wise mean of embedding vectors (the
  * label-centroid operator, SURVEY.md §2.4/§2.10 N4).
  *
  * Buffer = per-dimension MICRO-unit long sums (rint(x·1e6)), not double
  * sums: double addition is order-dependent and Spark merges partition
  * buffers in nondeterministic order, so a double-buffered mean would
  * not hash-match any oracle. Long sums are exact in any order — the
  * same contract as VectorOps.micros / graft.core.Exact, so the DuckDB
  * twin (q52's SQL shape) reproduces the result bit-for-bit.
  *
  * Scale: partial aggregation applies (buffers merge map-side), the
  * shuffle carries one (dims·8 + 8)-byte buffer per group per mapper —
  * centroid cost is independent of row count.
  */
class VectorMean(dims: Int) extends Aggregator[Seq[Float], VectorMean.Buf, Seq[Double]] {
  import VectorMean.Buf

  override def zero: Buf = Buf(Vector.fill(dims)(0L), 0L)

  override def reduce(b: Buf, a: Seq[Float]): Buf =
    if (a == null) b
    else {
      require(a.length == dims,
        s"VectorMean($dims): input vector has ${a.length} dims — schema drift " +
          "must fail loudly, not skew the centroid by zip-truncation")
      Buf(b.sums.zip(a).map { case (s, x) => s + math.rint(x.toDouble * 1e6).toLong },
        b.n + 1)
    }

  override def merge(x: Buf, y: Buf): Buf =
    Buf(x.sums.zip(y.sums).map { case (a, b) => a + b }, x.n + y.n)

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) Vector.fill(dims)(0.0)
    else b.sums.map(s => s.toDouble / 1e6 / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMean {
  case class Buf(sums: Seq[Long], n: Long)
}
