package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate (the partial-top-k pushdown every vector /
  * retrieval scorer wants): keeps the k best (score DESC, id ASC)
  * entries through reduce AND merge, so map-side partial aggregation
  * ships at most k rows per group per mapper instead of the full
  * candidate stream — a window `row_number() <= k` over N·M candidate
  * pairs shuffles all of them; this shuffles ≤ groups·mappers·k.
  *
  * Determinism: the kept set is a pure function of the input MULTISET —
  * total order (score DESC by java.lang.Double.compare — NaN greatest,
  * -0.0 < 0.0 — then id ASC) with unique ids means the k-th boundary is
  * never ambiguous, so partition order / merge order cannot change the
  * result (the same argument as VectorMean's long buffer; ties in score
  * are broken by id). reduce and merge share the SAME total order, so
  * results are bit-identical to the window form (Spark DESC also sorts
  * NaN first) and oracle-checkable.
  *
  * `tag` is an opaque payload carried alongside (a label, a bucket id);
  * `finish` returns the entries sorted best-first.
  */
class TopKScored(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[TopKScored.Entry], Seq[TopKScored.Entry]] {
  import TopKScored.Entry

  require(k > 0, s"TopKScored: k must be positive, got $k")

  // ONE total order for BOTH reduce and merge (ADVICE r5): IEEE `>`
  // treats -0.0 == 0.0 and never admits NaN, while a tuple Ordering
  // negates the score (flipping which zero wins and where NaN lands) —
  // mixed paths made the kept set depend on the partition split at the
  // k-boundary. java.lang.Double.compare is the same total order Spark
  // uses to sort doubles (NaN greatest, -0.0 < 0.0), so a NaN score
  // (zero-norm embedding in the q156 usage) ranks FIRST under DESC in
  // both this aggregate and the window row_number form it claims
  // bit-identity with.
  private val ord: Ordering[Entry] = new Ordering[Entry] {
    def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.score, a.score) // score DESC, total
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  // invariant: the buffer is ALWAYS sorted best-first and ≤ k long, so
  // the hot path (candidate worse than the k-th) is one comparison and
  // ZERO allocation — the property that makes 25M-row updates cheap.
  private def beats(s: Double, id: Long, e: Entry): Boolean = {
    val c = java.lang.Double.compare(s, e.score)
    c > 0 || (c == 0 && id < e.id)
  }

  override def zero: Seq[Entry] = Vector.empty

  override def reduce(b: Seq[Entry], a: (Double, Long, Long)): Seq[Entry] = {
    val (s, id, tag) = a
    if (b.length == k && !beats(s, id, b(k - 1))) b
    else {
      val i = b.indexWhere(e => beats(s, id, e)) match {
        case -1 => b.length
        case x  => x
      }
      val inserted = (b.take(i) :+ Entry(s, id, tag)) ++ b.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }
  }

  override def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[Entry]): Seq[Entry] = r

  override def bufferEncoder: Encoder[Seq[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  override def outputEncoder: Encoder[Seq[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
}

object TopKScored {
  case class Entry(score: Double, id: Long, tag: Long)
}
