package graft.operators

/** Compressed posting lists (SURVEY.md §2.11a X109, q258): the
  * standard inverted-index STORAGE layer — gap (delta) encoding of
  * sorted doc ids + LEB128 varints (7 payload bits per byte, MSB
  * continuation; Protocol Buffers' wire format, Lucene's vInt) — the
  * way every production IR system actually stores the q91 index.
  *
  * Stream layout per postings block (doc ids strictly ascending):
  * varint(first doc id), then per posting varint(gap to previous doc,
  * first posting's gap omitted), varint(tf), varint(first_pos). All
  * values are nonnegative integers; everything is integer arithmetic,
  * so the byte stream is deterministic and the DuckDB twin replays it
  * byte for byte from the rebuilt index (q258 hashes the stream).
  *
  * Scale: encoding is a per-block map over already-blocked rows (q91
  * shards postings into ≤ bucketWidth-entry blocks, so block size is
  * bounded at any corpus size); decode is the dataloader's read path.
  * Within a q91 bucket, gaps are < bucketWidth and code in ONE byte —
  * gap encoding is what makes that true; the absolute first id and
  * the positions exercise the multi-byte tiers. */
object PostingCodec {

  /** LEB128-append `v` (nonnegative) to `out`. */
  private def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint values must be nonnegative: $v0")
    var v = v0
    while (v >= 0x80) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>= 7
    }
    out.write(v.toInt)
  }

  /** Encode one block of (doc_id, tf, first_pos) postings, doc ids
    * strictly ascending. */
  def encode(postings: Seq[(Long, Long, Long)]): Array[Byte] = {
    require(postings.nonEmpty, "empty postings block")
    require(postings.sliding(2).forall {
      case Seq(a, b) => a._1 < b._1
      case _ => true
    }, "doc ids must be strictly ascending")
    val out = new java.io.ByteArrayOutputStream()
    putVarint(out, postings.head._1)
    var prev = postings.head._1
    postings.zipWithIndex.foreach { case ((doc, tf, pos), i) =>
      if (i > 0) putVarint(out, doc - prev)
      prev = doc
      putVarint(out, tf)
      putVarint(out, pos)
    }
    out.toByteArray
  }

  /** Decode a block of `n` postings; None on any violation (varint
    * runs past the buffer, oversized or overlong encoding, trailing
    * bytes — strict like every parser in this library). Canonical
    * form is enforced (ADVICE r14): values are nonnegative Longs, so
    * a valid varint is at most 9 bytes (a 9th byte at shift 56 must
    * terminate — a continuation there would set bit ≥ 63), and the
    * final byte of a multi-byte encoding must be nonzero (rejects
    * non-minimal encodings like `0x80 0x00` for 0) — every
    * out-of-range or non-canonical stream returns None instead of
    * silently decoding to a wrong nonnegative value. */
  def decode(bytes: Array[Byte], n: Int): Option[Seq[(Long, Long, Long)]] = {
    if (n <= 0) return None
    var pos = 0
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (pos < bytes.length) {
        val b = bytes(pos) & 0xff
        pos += 1
        if ((b & 0x80) == 0) {
          if (b == 0 && shift > 0) return -1L // non-minimal encoding
          return v | (b & 0x7fL) << shift
        }
        if (shift == 56) return -1L // 10th byte => bit >= 63: overflow
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      -1L
    }
    val out = Seq.newBuilder[(Long, Long, Long)]
    var doc = varint()
    if (doc < 0) return None
    var i = 0
    while (i < n) {
      if (i > 0) {
        val gap = varint()
        if (gap < 0) return None
        doc += gap
      }
      val tf = varint()
      val p = varint()
      if (tf < 0 || p < 0) return None
      out += ((doc, tf, p))
      i += 1
    }
    if (pos != bytes.length) return None // trailing bytes
    Some(out.result())
  }

  // --------------------------------------------------------------------
  // POSITIONAL postings (r15, X109c): the proximity layer — phrase and
  // near queries need EVERY position of a term in a doc, not just the
  // first, and production indexes store them delta-coded next to the
  // postings (Lucene's .prx/.pos data). Layout per block (doc ids
  // strictly ascending, positions strictly ascending within a doc):
  // varint(first doc id); per posting varint(gap to previous doc,
  // omitted for the first), varint(npos ≥ 1), varint(first position),
  // then npos−1 varint position gaps (each ≥ 1 — strictly ascending,
  // so a zero gap is non-canonical and rejects). Same canonical-strict
  // varints as [[decode]].
  // --------------------------------------------------------------------

  /** Encode one positional block of (doc_id, positions). */
  def encodePositional(postings: Seq[(Long, Seq[Long])]): Array[Byte] = {
    require(postings.nonEmpty, "empty positional block")
    require(postings.sliding(2).forall {
      case Seq(a, b) => a._1 < b._1
      case _ => true
    }, "doc ids must be strictly ascending")
    val out = new java.io.ByteArrayOutputStream()
    putVarint(out, postings.head._1)
    var prev = postings.head._1
    postings.zipWithIndex.foreach { case ((doc, ps), i) =>
      require(ps.nonEmpty, s"doc $doc has no positions")
      require(ps.sliding(2).forall {
        case Seq(a, b) => a < b
        case _ => true
      }, s"positions must be strictly ascending for doc $doc")
      if (i > 0) putVarint(out, doc - prev)
      prev = doc
      putVarint(out, ps.size.toLong)
      putVarint(out, ps.head)
      ps.sliding(2).foreach {
        case Seq(a, b) => putVarint(out, b - a)
        case _ => ()
      }
    }
    out.toByteArray
  }

  /** Decode a positional block of `n` postings; None on any violation
    * (all of [[decode]]'s rules, plus npos = 0 and zero position gaps
    * reject — both are streams no conformant encoder emits). */
  def decodePositional(bytes: Array[Byte], n: Int)
      : Option[Seq[(Long, Seq[Long])]] = {
    if (n <= 0) return None
    var pos = 0
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (pos < bytes.length) {
        val b = bytes(pos) & 0xff
        pos += 1
        if ((b & 0x80) == 0) {
          if (b == 0 && shift > 0) return -1L // non-minimal encoding
          return v | (b & 0x7fL) << shift
        }
        if (shift == 56) return -1L // 10th byte => bit >= 63: overflow
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      -1L
    }
    val out = Seq.newBuilder[(Long, Seq[Long])]
    var doc = varint()
    if (doc < 0) return None
    var i = 0
    while (i < n) {
      if (i > 0) {
        val gap = varint()
        if (gap < 0) return None
        doc += gap
      }
      val npos = varint()
      if (npos <= 0) return None
      val ps = Seq.newBuilder[Long]
      var p = varint()
      if (p < 0) return None
      ps += p
      var j = 1L
      while (j < npos) {
        val g = varint()
        if (g <= 0) return None // zero gap = non-ascending positions
        p += g
        ps += p
        j += 1
      }
      out += ((doc, ps.result()))
      i += 1
    }
    if (pos != bytes.length) return None // trailing bytes
    Some(out.result())
  }
}
