package graft.operators

/** Front-coded term dictionary (SURVEY.md §2.11a X111, q268): the
  * OTHER compressed half of an inverted index. q258 compresses the
  * posting lists; production indexes also compress the sorted term
  * dictionary itself — consecutive sorted terms share long prefixes,
  * so each term stores only (shared-prefix length, suffix), with the
  * block's first term restart-coded in full (Lucene's terms dict
  * blocks, the classic front coding of Witten/Moffat/Bell "Managing
  * Gigabytes" §4.1).
  *
  * Layout per block (terms strictly ascending, block size bounded by
  * the dictionary cut, q268 uses 16): per term varint(lcp) ·
  * varint(suffix_len) · suffix bytes, where lcp is the length of the
  * longest common prefix with the PREVIOUS term (0 for the block's
  * first term). All varints are the canonical-strict LEB128 of
  * [[PostingCodec]]; suffix bytes are the term's raw bytes after the
  * shared prefix.
  *
  * Strictness (the library-wide parser contract): decode returns None
  * on truncation, trailing bytes, non-canonical varints, an lcp that
  * exceeds the previous term's length, a zero-length suffix (strictly
  * ascending terms always differ past the shared prefix), a first
  * term with lcp ≠ 0, and a NON-MINIMAL lcp (the suffix restating a
  * byte the previous term shares at that position decodes to the same
  * string but is a stream no conformant encoder emits).
  *
  * Scale: encoding is a per-block map over an already-blocked
  * dictionary (blocks are built from a PrefixScan global ordinal —
  * one data shuffle, no corpus-sized window); block size is a
  * constant, so decode-on-lookup touches ≤ blockSize terms. */
object TermDictionary {

  private def putVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"varint values must be nonnegative: $v0")
    var v = v0
    while (v >= 0x80) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>= 7
    }
    out.write(v.toInt)
  }

  private def lcpOf(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  /** Encode one block of strictly-ascending terms. */
  def encode(terms: Seq[String]): Array[Byte] = {
    require(terms.nonEmpty, "empty dictionary block")
    require(terms.sliding(2).forall {
      case Seq(a, b) => a < b
      case _ => true
    }, "terms must be strictly ascending")
    val out = new java.io.ByteArrayOutputStream()
    var prev = ""
    terms.foreach { t =>
      val lcp = lcpOf(prev, t)
      val suffix = t.substring(lcp)
      putVarint(out, lcp.toLong)
      putVarint(out, suffix.length.toLong)
      suffix.foreach { c =>
        require(c < 128, s"term dictionary is byte-coded ASCII; got '$c'")
        out.write(c.toInt)
      }
      prev = t
    }
    out.toByteArray
  }

  /** Decode a block of `n` terms; None on any violation. */
  def decode(bytes: Array[Byte], n: Int): Option[Seq[String]] = {
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
    val out = Seq.newBuilder[String]
    var prev = ""
    var i = 0
    while (i < n) {
      val lcp = varint()
      val slen = varint()
      if (lcp < 0 || slen <= 0) return None // 0-suffix can't be ascending
      if (i == 0 && lcp != 0) return None   // first term restarts in full
      if (lcp > prev.length) return None
      if (pos + slen > bytes.length) return None
      val sb = new StringBuilder(prev.substring(0, lcp.toInt))
      var j = 0
      while (j < slen) {
        val c = bytes(pos) & 0xff
        pos += 1
        if (c >= 128) return None // byte-coded ASCII only
        sb.append(c.toChar)
        j += 1
      }
      val t = sb.result()
      // canonical lcp: the suffix must actually DIVERGE from prev at
      // position lcp (else a conformant encoder would have shared it)
      if (i > 0) {
        if (t <= prev) return None // strictly ascending
        if (lcp < prev.length && lcp < t.length &&
            t.charAt(lcp.toInt) == prev.charAt(lcp.toInt)) return None
      }
      out += t
      prev = t
      i += 1
    }
    if (pos != bytes.length) return None // trailing bytes
    Some(out.result())
  }
}
