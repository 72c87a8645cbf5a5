package graft.operators

/** Frame-of-Reference bit-packed postings (SURVEY.md §2.11a X109i,
  * q281): the tier ABOVE varints — q258's LEB128 spends a whole byte
  * per small value; production engines pack each block's values at a
  * FIXED bit width sized to the block's maximum (Lucene's FOR /
  * PackedInts, PForDelta's ancestor), which is why doc-aligned
  * blocking pays twice: gaps are small AND uniformly small, so a
  * ≤100-doc block's gaps typically pack at 7 bits, not 8.
  *
  * Layout per block (doc ids strictly ascending, all values ≥ 1
  * except the first doc id which may be 0):
  *   varint(first doc id) · varint(n) ·
  *   byte(w_gap)  · ceil((n−1)·w_gap  / 8) bytes of packed gaps ·
  *   byte(w_tf)   · ceil(n·w_tf  / 8) bytes of packed tfs ·
  *   byte(w_pos)  · ceil(n·w_pos / 8) bytes of packed first_pos.
  * Values pack LSB-first in stream order; each section pads to a byte
  * boundary with ZERO bits. Widths are MINIMAL (exactly the bit
  * length of the section's maximum; 1 when the section is empty) —
  * a wider-than-needed width, a set padding bit, a non-canonical
  * varint or any trailing byte rejects to None (the library-wide
  * strict-parser contract).
  *
  * Scale: same as [[PostingCodec]] — a per-block map over already-
  * blocked rows; decode is the dataloader's read path. */
object ForCodec {

  private def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0)
    var v = v0
    while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>= 7 }
    out.write(v.toInt)
  }

  private def bitLen(v: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Pack `vals` at width `w` (LSB-first), zero-padded to a byte. */
  private def pack(out: java.io.ByteArrayOutputStream,
                   vals: Seq[Long], w: Int): Unit = {
    var acc = 0L
    var nbits = 0
    vals.foreach { v =>
      acc |= v << nbits
      nbits += w
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    if (nbits > 0) out.write((acc & 0xff).toInt)
  }

  /** Encode one block of (doc_id, tf, first_pos); tf and first_pos
    * must be ≥ 1 (tf by definition, positions are 1-based). */
  def encode(postings: Seq[(Long, Long, Long)]): Array[Byte] = {
    require(postings.nonEmpty, "empty postings block")
    require(postings.sliding(2).forall {
      case Seq(a, b) => a._1 < b._1
      case _ => true
    }, "doc ids must be strictly ascending")
    require(postings.forall(p => p._2 >= 1 && p._3 >= 1),
      "tf and first_pos must be >= 1")
    val gaps = postings.sliding(2).collect {
      case Seq(a, b) => b._1 - a._1
    }.toSeq
    val tfs = postings.map(_._2)
    val fps = postings.map(_._3)
    def width(vs: Seq[Long]): Int =
      if (vs.isEmpty) 1 else vs.map(bitLen).max
    val out = new java.io.ByteArrayOutputStream()
    putVarint(out, postings.head._1)
    putVarint(out, postings.size.toLong)
    Seq(gaps, tfs, fps).foreach { vs =>
      val w = width(vs)
      out.write(w)
      pack(out, vs, w)
    }
    out.toByteArray
  }

  /** Strict decode of a block holding `n` postings. */
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
          if (b == 0 && shift > 0) return -1L
          return v | (b & 0x7fL) << shift
        }
        if (shift == 56) return -1L
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      -1L
    }
    def unpack(count: Int): Option[Seq[Long]] = {
      if (count < 0 || pos >= bytes.length) return None
      val w = bytes(pos) & 0xff
      pos += 1
      if (w < 1 || w > 63) return None
      if (count == 0 && w != 1) return None // canonical empty-section width
      // width math in Long (ADVICE r16): `count * w` as Int overflows
      // for counts near 2^31/w, making nbytes negative so the bounds
      // check passes and the read loop walks off the array
      val nbytesL = (count.toLong * w + 7) / 8
      if (nbytesL > (bytes.length - pos).toLong) return None
      val nbytes = nbytesL.toInt
      val vs = new Array[Long](count)
      var acc = 0L
      var nbits = 0
      var bi = 0
      var vi = 0
      while (vi < count) {
        while (nbits < w) {
          acc |= (bytes(pos + bi) & 0xffL) << nbits
          bi += 1
          nbits += 8
        }
        vs(vi) = acc & ((1L << w) - 1)
        acc >>>= w
        nbits -= w
        vi += 1
      }
      if (acc != 0) return None // set padding bits: non-canonical
      if (bi != nbytes) { // consume any pure-padding tail byte
        if (bi + 1 != nbytes || bytes(pos + bi) != 0) return None
        bi += 1
      }
      pos += nbytes
      // minimal width: some value must need the top bit
      if (count > 0 && !vs.exists(v => bitLen(v) == w)) return None
      Some(vs.toSeq)
    }
    val first = varint()
    if (first < 0) return None
    val cnt = varint()
    if (cnt != n.toLong) return None
    val gaps = unpack(n - 1).getOrElse(return None)
    val tfs = unpack(n).getOrElse(return None)
    val fps = unpack(n).getOrElse(return None)
    if (gaps.exists(_ < 1) || tfs.exists(_ < 1) || fps.exists(_ < 1))
      return None
    if (pos != bytes.length) return None // trailing bytes
    val docs = gaps.scanLeft(first)(_ + _)
    Some(docs.lazyZip(tfs).lazyZip(fps).map((d, t, p) => (d, t, p)).toSeq)
  }

  // --------------------------------------------------------------------
  // POSITIONAL FOR blocks (r16, X109l): the bit-packed tier for the
  // PROXIMITY store. q281 proved FOR wins 0.56× on (doc, tf, first_pos)
  // postings, but the position lists that phrase/NEAR/passage probes
  // decode (q263's layout) stayed LEB128 — the hottest proximity reads
  // on the fattest encoding, and position deltas are small ascending
  // gaps, FOR's best case. Layout per block (doc ids strictly
  // ascending; positions strictly ascending within a doc, 1-based):
  //   varint(first doc id) · varint(n) ·
  //   byte(w_gap) · packed doc gaps        (n−1 values, each ≥ 1) ·
  //   byte(w_np)  · packed npos            (n values, each ≥ 1) ·
  //   byte(w_fp)  · packed first positions (n values, each ≥ 1) ·
  //   byte(w_pg)  · packed position gaps   (Σ(npos−1) values, ≥ 1,
  //                 doc-major order)
  // Same canonical-strict contract as [[decode]]: minimal widths, zero
  // padding bits, canonical varints, no trailing bytes — any violation
  // rejects to None.
  // --------------------------------------------------------------------

  /** Encode one positional block of (doc_id, positions). */
  def encodePositional(postings: Seq[(Long, Seq[Long])]): Array[Byte] = {
    require(postings.nonEmpty, "empty positional block")
    require(postings.sliding(2).forall {
      case Seq(a, b) => a._1 < b._1
      case _ => true
    }, "doc ids must be strictly ascending")
    postings.foreach { case (doc, ps) =>
      require(ps.nonEmpty, s"doc $doc has no positions")
      require(ps.head >= 1, s"positions are 1-based for doc $doc")
      require(ps.sliding(2).forall {
        case Seq(a, b) => a < b
        case _ => true
      }, s"positions must be strictly ascending for doc $doc")
    }
    val gaps = postings.sliding(2).collect {
      case Seq(a, b) => b._1 - a._1
    }.toSeq
    val nps = postings.map(_._2.size.toLong)
    val fps = postings.map(_._2.head)
    val pgs = postings.flatMap { case (_, ps) =>
      ps.sliding(2).collect { case Seq(a, b) => b - a }
    }
    def width(vs: Seq[Long]): Int =
      if (vs.isEmpty) 1 else vs.map(bitLen).max
    val out = new java.io.ByteArrayOutputStream()
    putVarint(out, postings.head._1)
    putVarint(out, postings.size.toLong)
    Seq(gaps, nps, fps, pgs).foreach { vs =>
      val w = width(vs)
      out.write(w)
      pack(out, vs, w)
    }
    out.toByteArray
  }

  /** Strict decode of a positional block holding `n` postings. */
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
          if (b == 0 && shift > 0) return -1L
          return v | (b & 0x7fL) << shift
        }
        if (shift == 56) return -1L
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      -1L
    }
    def unpack(count: Int): Option[Seq[Long]] = {
      if (count < 0 || pos >= bytes.length) return None
      val w = bytes(pos) & 0xff
      pos += 1
      if (w < 1 || w > 63) return None
      if (count == 0 && w != 1) return None // canonical empty-section width
      // width math in Long (ADVICE r16): see [[decode]]'s unpack
      val nbytesL = (count.toLong * w + 7) / 8
      if (nbytesL > (bytes.length - pos).toLong) return None
      val nbytes = nbytesL.toInt
      val vs = new Array[Long](count)
      var acc = 0L
      var nbits = 0
      var bi = 0
      var vi = 0
      while (vi < count) {
        while (nbits < w) {
          acc |= (bytes(pos + bi) & 0xffL) << nbits
          bi += 1
          nbits += 8
        }
        vs(vi) = acc & ((1L << w) - 1)
        acc >>>= w
        nbits -= w
        vi += 1
      }
      if (acc != 0) return None // set padding bits: non-canonical
      if (bi != nbytes) { // consume any pure-padding tail byte
        if (bi + 1 != nbytes || bytes(pos + bi) != 0) return None
        bi += 1
      }
      pos += nbytes
      if (count > 0 && !vs.exists(v => bitLen(v) == w)) return None
      Some(vs.toSeq)
    }
    val first = varint()
    if (first < 0) return None
    val cnt = varint()
    if (cnt != n.toLong) return None
    val gaps = unpack(n - 1).getOrElse(return None)
    val nps = unpack(n).getOrElse(return None)
    // reject npos values that can't fit an Int BEFORE any .toInt (a
    // crafted block claiming npos = 2^31 used to wrap negative) and
    // bound the claimed position-gap total by what the remaining bytes
    // could possibly hold at the minimum 1-bit width (ADVICE r16)
    if (gaps.exists(_ < 1) ||
        nps.exists(v => v < 1 || v > Int.MaxValue.toLong)) return None
    val totalPg = nps.map(_ - 1).sum
    if (totalPg > Int.MaxValue.toLong ||
        totalPg > (bytes.length - pos).toLong * 8) return None
    val fps = unpack(n).getOrElse(return None)
    val pgs = unpack(totalPg.toInt).getOrElse(return None)
    if (fps.exists(_ < 1) || pgs.exists(_ < 1)) return None
    if (pos != bytes.length) return None // trailing bytes
    val docs = gaps.scanLeft(first)(_ + _)
    var pgOff = 0
    val out = Seq.newBuilder[(Long, Seq[Long])]
    var i = 0
    while (i < n) {
      val np = nps(i).toInt
      val ps = pgs.slice(pgOff, pgOff + np - 1)
        .scanLeft(fps(i))(_ + _)
      pgOff += np - 1
      out += ((docs(i), ps))
      i += 1
    }
    Some(out.result())
  }
}
