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
      if (pos >= bytes.length) return None
      val w = bytes(pos) & 0xff
      pos += 1
      if (w < 1 || w > 63) return None
      if (count == 0 && w != 1) return None // canonical empty-section width
      val nbytes = (count * w + 7) / 8
      if (pos + nbytes > bytes.length) return None
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
}
