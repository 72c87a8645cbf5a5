package graft.operators

/** X109i FOR-packing pins: a hand-packed block (every byte named),
  * the strict roundtrip, the size win over LEB128 on a dense block,
  * and the rejection matrix — non-minimal widths, set padding bits,
  * wrong counts, truncation, trailing bytes.
  */
class ForCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  // 3 postings: docs 200, 201, 203 (gaps 1, 2 -> w=2);
  // tfs 1, 3, 2 (w=2); first_pos 5, 1, 9 (w=4)
  private val block = Seq((200L, 1L, 5L), (201L, 3L, 1L), (203L, 2L, 9L))

  test("hand-packed byte stream: widths, LSB-first packing, padding") {
    val bytes = ForCodec.encode(block)
    val expect = Array[Int](
      0xC8, 0x01, // varint(200) = 200%128+128=0xC8, 200//128=1
      3,          // varint(n=3)
      2, 0x09,    // w_gap=2; gaps 1,2 LSB-first: 01 then 10 -> 1001b = 9
      2, 0x2D,    // w_tf=2; tfs 1,3,2: 01 11 10 -> bits 101101b = 0x2D
      4, 0x15, 0x09 // w_pos=4; 5,1,9: 0101 1000 1001 -> 0x15, 0x09
    ).map(_.toByte)
    assert(bytes.toSeq === expect.toSeq)
  }

  test("roundtrip, incl. the single-posting empty-gap-section block") {
    assert(ForCodec.decode(ForCodec.encode(block), 3).contains(block))
    val one = Seq((0L, 7L, 1L))
    assert(ForCodec.decode(ForCodec.encode(one), 1).contains(one))
  }

  test("FOR packs a dense block tighter than LEB128") {
    // 100 consecutive docs, tf 1, pos 1: gaps all 1 -> 1-bit packing
    val dense = (0L until 100L).map(i => (i, 1L, 1L))
    val forBytes = ForCodec.encode(dense).length
    val lebBytes = PostingCodec.encode(dense).length
    assert(forBytes < lebBytes,
      s"FOR $forBytes >= LEB $lebBytes on the dense block")
  }

  test("rejection matrix") {
    val good = ForCodec.encode(block)
    assert(ForCodec.decode(good.dropRight(1), 3).isEmpty)          // truncated
    assert(ForCodec.decode(good :+ 0x00.toByte, 3).isEmpty)        // trailing
    assert(ForCodec.decode(good, 2).isEmpty)                       // wrong n
    assert(ForCodec.decode(good, 4).isEmpty)
    // non-minimal width: widen w_gap to 3 and repack gaps 1,2
    // (001 010 -> 010001b = 0x11): decodes to the same gaps but is
    // a stream no conformant encoder emits
    val wide = Array[Int](0xC8, 0x01, 3, 3, 0x11, 2, 0x2D, 4, 0x15, 0x09)
      .map(_.toByte)
    assert(ForCodec.decode(wide, 3).isEmpty)
    // set padding bit in the tf section's final byte (top bits unused)
    val badPad = good.clone()
    badPad(6) = (badPad(6) | 0x40).toByte // tf data byte: bits 0-5 used
    assert(ForCodec.decode(badPad, 3).isEmpty)
    // zero width byte
    val w0 = Array[Int](0xC8, 0x01, 3, 0, 2, 0x2D, 4, 0x15, 0x09)
      .map(_.toByte)
    assert(ForCodec.decode(w0, 3).isEmpty)
  }

  test("encoder preconditions throw: empty, descending ids, zero tf/pos") {
    intercept[IllegalArgumentException](ForCodec.encode(Nil))
    intercept[IllegalArgumentException](
      ForCodec.encode(Seq((2L, 1L, 1L), (1L, 1L, 1L))))
    intercept[IllegalArgumentException](
      ForCodec.encode(Seq((1L, 0L, 1L))))
  }

  // ---- positional FOR blocks (X109l, r16) ----

  // docs: 10 with positions (2, 4, 5); 12 with position (1)
  private val posBlock = Seq((10L, Seq(2L, 4L, 5L)), (12L, Seq(1L)))

  test("positional hand-packed byte stream: four sections, per-section " +
    "minimal widths") {
    val bytes = ForCodec.encodePositional(posBlock)
    val expect = Array[Int](
      0x0A,    // varint(first doc = 10)
      0x02,    // varint(n = 2)
      2, 0x02, // gaps (1 value): 2 -> w=2, LSB-first 10b
      2, 0x07, // npos (2 values): 3, 1 -> w=2: 11 | 01<<2 = 0111b
      2, 0x06, // first positions: 2, 1 -> w=2: 10 | 01<<2 = 0110b
      2, 0x06  // position gaps (3->[2,1]): w=2: 10 | 01<<2 = 0110b
    ).map(_.toByte)
    assert(bytes.toSeq === expect.toSeq)
  }

  test("positional roundtrip, incl. the all-single-position block " +
    "(empty position-gap section)") {
    assert(ForCodec.decodePositional(
      ForCodec.encodePositional(posBlock), 2).contains(posBlock))
    val singles = Seq((0L, Seq(3L)), (7L, Seq(1L)))
    assert(ForCodec.decodePositional(
      ForCodec.encodePositional(singles), 2).contains(singles))
    val one = Seq((5L, Seq(1L, 2L, 3L, 900L)))
    assert(ForCodec.decodePositional(
      ForCodec.encodePositional(one), 1).contains(one))
  }

  test("positional FOR packs a dense block tighter than positional LEB128") {
    // 100 consecutive docs, each with 4 small-gap positions — the
    // phrase store's common shape
    val dense = (0L until 100L).map(i =>
      (i, Seq(1L + i % 3, 4L + i % 3, 6L + i % 3, 9L + i % 3)))
    val forBytes = ForCodec.encodePositional(dense).length
    val lebBytes = PostingCodec.encodePositional(dense).length
    assert(forBytes < lebBytes,
      s"positional FOR $forBytes >= LEB $lebBytes on the dense block")
  }

  test("positional rejection matrix") {
    val good = ForCodec.encodePositional(posBlock)
    assert(ForCodec.decodePositional(good.dropRight(1), 2).isEmpty) // truncated
    assert(ForCodec.decodePositional(good :+ 0x00.toByte, 2).isEmpty) // trailing
    assert(ForCodec.decodePositional(good, 1).isEmpty)  // wrong n
    assert(ForCodec.decodePositional(good, 3).isEmpty)
    // zero position gap (= non-ascending positions): repack posgaps as
    // [2, 0] (10 | 00<<2 = 0x02 — still minimal w=2 via the first
    // value, so the ONLY violation is the zero gap itself)
    val zeroGap = good.clone()
    zeroGap(9) = 0x02.toByte // posgaps become [2, 0]
    assert(ForCodec.decodePositional(zeroGap, 2).isEmpty)
    // zero npos: npos section [3, 0] -> 11 | 00<<2 = 0x03; rejects on
    // npos >= 1 (and the posgap count would shift anyway)
    val zeroNp = good.clone()
    zeroNp(5) = 0x03.toByte
    assert(ForCodec.decodePositional(zeroNp, 2).isEmpty)
    // non-minimal width in the gaps section: w=3 for gap 2
    // (010 -> 0x02) — decodes to the same gap but no conformant
    // encoder emits it
    val wide = Array[Int](0x0A, 0x02, 3, 0x02, 2, 0x07, 2, 0x06, 2, 0x06)
      .map(_.toByte)
    assert(ForCodec.decodePositional(wide, 2).isEmpty)
    // set padding bit in the npos section byte (bits 4-7 unused)
    val badPad = good.clone()
    badPad(5) = (badPad(5) | 0x80).toByte
    assert(ForCodec.decodePositional(badPad, 2).isEmpty)
  }

  test("crafted-count overflow blocks reject to None, never throw " +
    "(ADVICE r16: Int width math wrapped negative on huge claimed " +
    "counts)") {
    // a block claiming one doc with npos = 2^31: varint(doc=0),
    // varint(n=1), gaps section (count 0, w=1), npos section packing
    // the single value 2^31 at w=32, then whatever follows — the old
    // Int math made nbytes negative in the pgs unpack and walked off
    // the array. Build it byte by byte.
    val out = new java.io.ByteArrayOutputStream()
    def vi(v0: Long): Unit = {
      var v = v0
      while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>= 7 }
      out.write(v.toInt)
    }
    vi(0L); vi(1L)     // first doc 0, n = 1
    out.write(1)       // w_gap = 1, zero gap values (n-1 = 0)
    out.write(32)      // w_np = 32
    // the single npos value 2^31, LSB-first over 4 bytes
    out.write(0); out.write(0); out.write(0); out.write(0x80)
    out.write(1); out.write(1) // w_fp = 1; first position 1
    out.write(1)       // w_pg = 1, then too few bytes for 2^31-1 gaps
    out.write(0xFF)
    val crafted = out.toByteArray
    assert(ForCodec.decodePositional(crafted, 1).isEmpty,
      "huge-npos block must reject, not throw")
    // and the fuzz net: arbitrary byte soup never throws for ANY
    // (bytes, n) — the strict decoders' total contract
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3000) {
      val len = rnd.nextInt(40)
      val bs = Array.fill(len)(rnd.nextInt(256).toByte)
      val n = rnd.nextInt(6)
      ForCodec.decodePositional(bs, n) // Option or bust
      ForCodec.decode(bs, n)
      PostingCodec.decodePositional(bs, n)
      PostingCodec.decode(bs, n): Unit
    }
  }

  test("positional encoder preconditions throw: empty block, empty or " +
    "non-ascending or 0-based positions, descending docs") {
    intercept[IllegalArgumentException](ForCodec.encodePositional(Nil))
    intercept[IllegalArgumentException](
      ForCodec.encodePositional(Seq((1L, Seq.empty[Long]))))
    intercept[IllegalArgumentException](
      ForCodec.encodePositional(Seq((1L, Seq(3L, 3L)))))
    intercept[IllegalArgumentException](
      ForCodec.encodePositional(Seq((1L, Seq(0L, 2L)))))
    intercept[IllegalArgumentException](
      ForCodec.encodePositional(Seq((2L, Seq(1L)), (1L, Seq(1L)))))
  }
}
