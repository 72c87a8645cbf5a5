package graft.operators

/** X111 front-coding pins: a hand-counted block (every byte named),
  * the strict roundtrip, and the full rejection matrix — truncation,
  * trailing bytes, non-minimal varints, impossible lcp, zero-length
  * suffix, non-minimal lcp (re-stating a shared byte), descending
  * terms, and a first term that does not restart in full.
  */
class TermDictionarySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val block = Seq("merge", "merged", "merges", "spark")

  test("hand-counted byte stream: lcp/suffix framing is exactly as " +
    "declared") {
    val bytes = TermDictionary.encode(block)
    val expect = Array[Int](
      0, 5, 'm', 'e', 'r', 'g', 'e', // merge: lcp 0, suffix "merge"
      5, 1, 'd',                     // merged: lcp 5, suffix "d"
      5, 1, 's',                     // merges: lcp 5, suffix "s"
      0, 5, 's', 'p', 'a', 'r', 'k'  // spark: lcp 0 (vs merges), suffix full
    ).map(_.toByte)
    assert(bytes.toSeq === expect.toSeq)
  }

  test("roundtrip: decode(encode(terms)) == terms") {
    assert(TermDictionary.decode(TermDictionary.encode(block), block.size)
      .contains(block))
    val one = Seq("a")
    assert(TermDictionary.decode(TermDictionary.encode(one), 1)
      .contains(one))
  }

  test("rejection matrix: every malformed stream decodes to None") {
    val good = TermDictionary.encode(block)
    // truncation
    assert(TermDictionary.decode(good.dropRight(1), block.size).isEmpty)
    // trailing bytes
    assert(TermDictionary.decode(good :+ 0x00.toByte, block.size).isEmpty)
    // wrong count
    assert(TermDictionary.decode(good, block.size - 1).isEmpty)
    assert(TermDictionary.decode(good, block.size + 1).isEmpty)
    // non-minimal varint for lcp 0: 0x80 0x00
    val overlong = Array[Int](0x80, 0x00, 1, 'a').map(_.toByte)
    assert(TermDictionary.decode(overlong, 1).isEmpty)
    // first term must restart in full (lcp 0)
    val badFirst = Array[Int](1, 1, 'a').map(_.toByte)
    assert(TermDictionary.decode(badFirst, 1).isEmpty)
    // lcp beyond the previous term's length
    val farLcp = Array[Int](0, 1, 'a', 2, 1, 'b').map(_.toByte)
    assert(TermDictionary.decode(farLcp, 2).isEmpty)
    // zero-length suffix (equal to previous term)
    val zeroSuffix = Array[Int](0, 1, 'a', 1, 0).map(_.toByte)
    assert(TermDictionary.decode(zeroSuffix, 2).isEmpty)
    // non-minimal lcp: "ab" then "ac" coded with lcp 0 ("ac" restated)
    // decodes to ascending terms but no conformant encoder emits it
    val nonMinimal = Array[Int](0, 2, 'a', 'b', 0, 2, 'a', 'c').map(_.toByte)
    assert(TermDictionary.decode(nonMinimal, 2).isEmpty)
    // descending terms
    val descending = Array[Int](0, 1, 'b', 0, 1, 'a').map(_.toByte)
    assert(TermDictionary.decode(descending, 2).isEmpty)
    // non-ASCII suffix byte (lcp 0, slen 1, suffix byte 0xC8)
    val nonAscii = Array[Int](0, 1, 0xC8).map(_.toByte)
    assert(TermDictionary.decode(nonAscii, 1).isEmpty)
  }

  test("encoder preconditions throw: empty block, unsorted terms, " +
    "non-ASCII chars") {
    intercept[IllegalArgumentException](TermDictionary.encode(Nil))
    intercept[IllegalArgumentException](
      TermDictionary.encode(Seq("b", "a")))
    intercept[IllegalArgumentException](
      TermDictionary.encode(Seq("héllo")))
  }
}
