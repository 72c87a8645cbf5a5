package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PostingCodecSpec extends AnyFunSuite {

  private val block = Seq((1000L, 3L, 7L), (1001L, 1L, 200L),
    (1099L, 2L, 16500L), (5000L, 1L, 1L))

  test("roundtrip: decode(encode(block)) == block; gaps within a q91 " +
    "bucket code in one byte while the absolute head and large " +
    "positions take their multi-byte tiers") {
    val bytes = PostingCodec.encode(block)
    assert(PostingCodec.decode(bytes, block.size).contains(block))
    // hand-count: 1000 -> 2B; (3,7) -> 1B+1B; gap 1 -> 1B; (1,200) ->
    // 1B+2B; gap 98 -> 1B; (2,16500) -> 1B+3B; gap 3901 -> 2B; (1,1)
    // -> 1B+1B. Total 17 bytes vs 4*3*8 = 96 raw.
    assert(bytes.length === 17, s"LEB128 framing drifted: ${bytes.length}")
  }

  test("strictness: trailing bytes, truncation, wrong count and " +
    "oversized continuation all decode to None; encode rejects " +
    "unsorted and negative input") {
    val bytes = PostingCodec.encode(block)
    assert(PostingCodec.decode(bytes :+ 0.toByte, block.size).isEmpty,
      "trailing byte accepted")
    assert(PostingCodec.decode(bytes.dropRight(1), block.size).isEmpty,
      "truncation accepted")
    assert(PostingCodec.decode(bytes, block.size - 1).isEmpty,
      "short count leaves trailing bytes - must reject")
    assert(PostingCodec.decode(bytes, block.size + 1).isEmpty,
      "long count runs past the buffer - must reject")
    assert(PostingCodec.decode(Array.fill(12)(0x80.toByte), 1).isEmpty,
      "unterminated continuation accepted")
    intercept[IllegalArgumentException] {
      PostingCodec.encode(Seq((5L, 1L, 1L), (3L, 1L, 1L)))
    }
    intercept[IllegalArgumentException] {
      PostingCodec.encode(Seq((-1L, 1L, 1L)))
    }
  }

  test("canonical form (ADVICE r14): non-minimal encodings and 10-byte " +
    "varints are rejected, never silently decoded to a wrong value") {
    // 0x80 0x00 is a 2-byte encoding of 0 — non-minimal, must reject
    // (stream shape: doc=0x80 0x00, tf=1, pos=1 would decode as
    // (0,1,1) under a lax parser)
    assert(PostingCodec.decode(
      Array(0x80, 0x00, 0x01, 0x01).map(_.toByte), 1).isEmpty,
      "non-minimal varint (0x80 0x00) accepted")
    // the canonical encoding of the same postings decodes fine
    assert(PostingCodec.decode(Array(0x00, 0x01, 0x01).map(_.toByte), 1)
      .contains(Seq((0L, 1L, 1L))))
    // a 10th byte means bit >= 63 — out of the nonnegative-Long domain
    // (9 continuation bytes then a terminator: shift reaches 63)
    val tenByte = Array.fill(9)(0x80.toByte) :+ 0x01.toByte
    assert(PostingCodec.decode(tenByte ++ Array[Byte](0x01, 0x01), 1)
      .isEmpty, "10-byte varint (bit 63) accepted")
    // 9 bytes is the canonical maximum: 2^62 codes as 8 continuation
    // bytes + terminator 0x40 and roundtrips
    val big = Seq(((1L << 62), 1L, 1L))
    val enc = PostingCodec.encode(big)
    assert(enc.length === 9 + 2)
    assert(PostingCodec.decode(enc, 1).contains(big))
  }

  test("positional layer (X109c): roundtrip with delta-coded position " +
    "lists; byte accounting; strictness (npos=0, zero position gap, " +
    "truncation, trailing bytes, unsorted input all reject)") {
    val blk = Seq(
      (1000L, Seq(3L, 4L, 200L)),
      (1001L, Seq(1L)),
      (1099L, Seq(7L, 16500L)))
    val bytes = PostingCodec.encodePositional(blk)
    assert(PostingCodec.decodePositional(bytes, blk.size).contains(blk))
    // hand-count: 1000 -> 2B; [3: 3,1,196] -> 1+1+1+2; gap 1 -> 1;
    // [1: 1] -> 1+1; gap 98 -> 1; [2: 7, 16493] -> 1+1+3. Total 16.
    assert(bytes.length === 16, s"positional framing drifted: ${bytes.length}")
    // strictness
    assert(PostingCodec.decodePositional(bytes :+ 0.toByte, 3).isEmpty)
    assert(PostingCodec.decodePositional(bytes.dropRight(1), 3).isEmpty)
    assert(PostingCodec.decodePositional(bytes, 2).isEmpty)
    assert(PostingCodec.decodePositional(bytes, 4).isEmpty)
    // npos = 0 in the stream: doc=5, npos=0 -> reject
    assert(PostingCodec.decodePositional(Array[Byte](5, 0), 1).isEmpty,
      "npos = 0 accepted")
    // zero position gap (non-ascending): doc=5, npos=2, p=1, gap=0
    assert(PostingCodec.decodePositional(Array[Byte](5, 2, 1, 0), 1)
      .isEmpty, "zero position gap accepted")
    intercept[IllegalArgumentException] {
      PostingCodec.encodePositional(Seq((5L, Seq(3L, 3L))))
    }
    intercept[IllegalArgumentException] {
      PostingCodec.encodePositional(Seq((5L, Seq.empty[Long])))
    }
    intercept[IllegalArgumentException] {
      PostingCodec.encodePositional(Seq((5L, Seq(1L)), (4L, Seq(1L))))
    }
  }
}
