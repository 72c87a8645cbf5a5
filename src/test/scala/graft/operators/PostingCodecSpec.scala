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
}
