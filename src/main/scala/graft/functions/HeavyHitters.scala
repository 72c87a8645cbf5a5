package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heavy-hitters sketch: a MERGEABLE Misra-Gries summary as a typed UDAF
  * (SURVEY.md §2.11a; the frequent-items operator a training-data
  * pipeline runs over petabyte key streams — hot domains, boilerplate
  * fingerprints, viral n-grams — where exact per-key counting would
  * shuffle every distinct key).
  *
  * The sketch keeps at most `capacity` counters. Classic MG step: count
  * a seen item; inserting a NEW item into a full summary instead
  * decrements every counter (dropping zeros) — each decrement "spends"
  * one occurrence of capacity+1 distinct items, so any item with true
  * frequency > N/(capacity+1) MUST survive, with
  * est ∈ (true − N/(capacity+1), true]. Merging (Agarwal et al.,
  * "Mergeable Summaries", PODS '12) sums counters, then subtracts the
  * (capacity+1)-th largest count and drops non-positives — the same
  * error bound holds under arbitrary merge trees, which is what makes
  * this a one-pass distributed aggregate: partial summaries combine
  * map-side and the shuffle carries ≤ capacity counters per partition,
  * cost independent of row count.
  *
  * Exactness contract (how q85 hash-matches a SQL oracle): while the
  * summary never fills past `capacity`, no decrement ever happens and
  * every estimate is the EXACT count. With capacity ≥ distinct keys the
  * operator degenerates to a group-count — the oracle checks that
  * regime; the ScalaTest property pins the survival guarantee and error
  * bound in the lossy regime.
  *
  * Buffer choice: `udaf(...)` wraps an Aggregator in ScalaAggregator, a
  * TypedImperativeAggregate — the buffer lives as a JVM object across
  * `reduce` calls and hits `bufferEncoder` only at partial-result
  * boundaries. A mutable map buffer therefore gives O(1) per row; a
  * "nicer" (keys, counts) product buffer would pay an O(capacity)
  * decode/encode on EVERY row. Kryo handles the map at the (rare)
  * serialization points.
  */
class HeavyHitters(capacity: Int)
  extends Aggregator[Long, mutable.HashMap[Long, Long], Seq[HeavyHitters.Hit]] {
  import HeavyHitters.Hit
  require(capacity > 0, s"HeavyHitters capacity must be positive: $capacity")

  type Buf = mutable.HashMap[Long, Long]

  override def zero: Buf = mutable.HashMap.empty[Long, Long]

  override def reduce(m: Buf, key: Long): Buf = {
    m.get(key) match {
      case Some(c) => m.update(key, c + 1)
      case None if m.size < capacity => m.update(key, 1L)
      case None => decrementAll(m, 1L) // spends one occurrence of each
    }
    m
  }

  override def merge(x: Buf, y: Buf): Buf = {
    y.foreach { case (k, c) => x.update(k, x.getOrElse(k, 0L) + c) }
    if (x.size > capacity) {
      // subtract the (capacity+1)-th largest count; ≤ capacity survive
      val cut = x.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
      decrementAll(x, cut)
    }
    x
  }

  private def decrementAll(m: Buf, by: Long): Unit =
    m.keys.toArray.foreach { k =>
      val c = m(k) - by
      if (c <= 0) m.remove(k) else m.update(k, c)
    }

  /** Survivors, heaviest first (count desc, key asc — deterministic). */
  override def finish(m: Buf): Seq[Hit] =
    m.iterator.map { case (k, c) => Hit(k, c) }
      .toIndexedSeq.sortBy(h => (-h.est, h.key))

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Hit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
}

object HeavyHitters {
  case class Hit(key: Long, est: Long)
}
