package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X78 — map-side Gram-matrix accumulator for the embedding covariance
  * family (q174/q175/q176): one typed aggregate that folds each row's
  * d(d+1)/2 pair products, its d per-dimension micro values, and the
  * row count into a single primitive long buffer.
  *
  * This replaces the explode formulation (each row materializing 2080
  * `named_struct` rows through an interpreted HOF chain before a
  * 2080-key shuffle): here the O(d²) arithmetic — which IS the
  * statistic — runs as a tight primitive loop inside the partial
  * aggregate, nothing is materialized per row, and the shuffle carries
  * ONE (2145·8)-byte buffer per partition. Same asymptotics, ~no
  * per-row allocation, no generator, no row blow-up.
  *
  * Determinism (the VectorMean contract): every accumulated value is an
  * exactly-rounded IEEE product micro-quantized to BIGINT via
  * `math.rint(x·1e6)` — bit-identical to the SQL
  * `CAST(rint(... * 1000000.0) AS BIGINT)` the previous explode form
  * used and the DuckDB `DECIMAL(18,6)` twin uses — and sums of longs
  * are exact in any partitioning / merge order.
  *
  * Buffer layout (length d(d+1)/2 + d + 1, d=64 → 2145):
  *   [0, 2080)    pair sums, (i,j) i ≤ j at linear index
  *                i·d − i(i−1)/2 + (j − i)
  *   [2080, 2144) per-dimension micro sums (the mean numerators)
  *   [2144]       row count (null embeddings count toward n but
  *                contribute no sums — matching the explode form, where
  *                `count(lit(1))` saw every row but a null array
  *                exploded to zero rows)
  */
class GramMicros(dims: Int)
    extends Aggregator[Seq[Float], GramMicros.Buf, Seq[Long]] {
  import GramMicros.Buf

  private val nPairs = dims * (dims + 1) / 2
  private val len = nPairs + dims + 1

  override def zero: Buf = Buf(new Array[Long](len))

  override def reduce(b: Buf, a: Seq[Float]): Buf = {
    val c = b.cells
    c(len - 1) += 1L
    if (a != null) {
      require(a.length == dims,
        s"GramMicros($dims): input vector has ${a.length} dims — schema " +
          "drift must fail loudly, not silently skew the Gram matrix")
      val x = new Array[Double](dims)
      var i = 0
      while (i < dims) { x(i) = a(i).toDouble; i += 1 }
      var k = 0
      i = 0
      while (i < dims) {
        val xi = x(i)
        c(nPairs + i) += math.rint(xi * 1e6).toLong
        var j = i
        while (j < dims) {
          c(k) += math.rint(xi * x(j) * 1e6).toLong
          j += 1; k += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    val a = x.cells; val b = y.cells
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    x
  }

  override def finish(b: Buf): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b.cells)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object GramMicros {
  case class Buf(cells: Array[Long])
}
