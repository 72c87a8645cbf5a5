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
}
