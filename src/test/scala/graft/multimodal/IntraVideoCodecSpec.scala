package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import IntraVideoCodec._

class IntraVideoCodecSpec extends AnyFunSuite {

  private val seed: Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest("intra-codec-fixture".getBytes("UTF-8"))

  private def plane(w: Int, h: Int, salt: Int): Array[Int] =
    Array.tabulate(w * h)(i => seed((i + salt) % 16) & 0xff)

  test("drift law: parse(encode(frames)) == encoder's closed-loop " +
    "reconstruction bit-exactly, across intra AND P frames") {
    val w = 12; val h = 8
    val f0 = plane(w, h, 0)
    val f1 = plane(w, h, 5)
    val f2 = f1.clone(); f2(17) = 255 - f2(17)
    val frames = Seq(f0, f1, f2)
    val bytes = encode(frames, w, h, qp = 4)
    val v = parse(bytes).getOrElse(fail("roundtrip parse failed"))
    assert(v.w === w && v.h === h && v.qp === 4 && v.frames.size === 3)
    val want = reconstruct(frames, w, h, qp = 4)
    v.frames.zip(want).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(got.sameElements(exp), s"frame $i drifted from the closed loop")
    }
  }

  test("distortion bound: |recon - source| <= step/2 + 1 per sample at " +
    "every qp, for intra and P frames alike") {
    val w = 8; val h = 8
    val f0 = plane(w, h, 0)
    val f1 = plane(w, h, 3)
    (0 to 7).foreach { qp =>
      val step = 1 << qp
      val rec = reconstruct(Seq(f0, f1), w, h, qp)
      Seq(f0, f1).zip(rec).zipWithIndex.foreach { case ((src, r), fi) =>
        val worst = src.zip(r).map { case (a, b) => math.abs(a - b) }.max
        assert(worst <= step / 2 + 1,
          s"qp=$qp frame $fi: worst error $worst > ${step / 2 + 1}")
      }
    }
  }

  test("qp=0 is lossless (step 1 quantizes nothing the exact-integer " +
    "inverse cannot recover)") {
    val w = 8; val h = 4
    val f0 = plane(w, h, 0)
    val f1 = plane(w, h, 7)
    val v = parse(encode(Seq(f0, f1), w, h, qp = 0)).get
    assert(v.frames.head.sameElements(f0) && v.frames(1).sameElements(f1))
  }

  test("compression laws: a flat plane codes to near-nothing; a " +
    "near-static P frame costs a fraction of its intra coding; higher " +
    "qp never costs more bits") {
    val w = 16; val h = 16
    val flat = Array.fill(w * h)(128)
    val busy = plane(w, h, 0)
    val flatB = frameBytes(Seq(flat), w, h, qp = 4).head
    val busyB = frameBytes(Seq(busy), w, h, qp = 4).head
    assert(flatB * 3 < busyB,
      s"flat plane ($flatB B) should code far below a busy one ($busyB B)")
    // near-static second frame: P-residual ~ quantization noise only
    val drift = busy.clone(); drift(33) = 255 - drift(33)
    val Seq(intraB, pB) = frameBytes(Seq(busy, drift), w, h, qp = 4)
    assert(pB * 2 < intraB,
      s"near-static P frame ($pB B) should code far below intra ($intraB B)")
    val b4 = frameBytes(Seq(busy), w, h, qp = 4).head
    val b6 = frameBytes(Seq(busy), w, h, qp = 6).head
    assert(b6 <= b4, s"qp=6 ($b6 B) must not out-cost qp=4 ($b4 B)")
  }

  test("hand-worked single block: Hadamard coefficients, quantized " +
    "levels and reconstruction match the by-hand integer arithmetic") {
    // 4x4 intra block, qp=4 (step 16). X = sample - 128.
    val src = Array(
      128, 144, 128, 144,
      128, 144, 128, 144,
      128, 144, 128, 144,
      128, 144, 128, 144)
    // X alternates 0,16 by column: row transform of (0,16,0,16) under H
    // rows (+,+,+,+)/(+,+,-,-)/(+,-,-,+)/(+,-,+,-) = (32,0,0,-32); the
    // column transform of constant columns puts 4x into row u=0:
    // Y[0][0]=128, Y[0][3]=-128, rest 0. Levels at step 16: 8 and -8.
    // Dequant restores exactly (128 = 8*16), inverse /16 recovers X.
    val bytes = encode(Seq(src), 4, 4, qp = 4)
    val v = parse(bytes).get
    assert(v.frames.head.sameElements(src),
      "a block whose coefficients sit ON the quantizer grid must survive " +
        "losslessly")
    // shift one sample off-grid by less than step/2: recon snaps back
    val off = src.clone(); off(5) = 151 // 144+7, within step/2=8
    val v2 = parse(encode(Seq(off), 4, 4, qp = 4)).get
    val err = v2.frames.head.zip(off).map { case (a, b) => math.abs(a - b) }.max
    assert(err <= 9, s"off-grid sample error $err exceeds step/2+1")
  }

  test("strict parse: bad magic, dims not multiples of 4, qp out of " +
    "range, frame CRC corruption, truncation, nonzero padding and " +
    "trailing bytes all return None") {
    val w = 8; val h = 8
    val good = encode(Seq(plane(w, h, 0), plane(w, h, 3)), w, h, qp = 4)
    assert(parse(good).isDefined)
    val m1 = good.clone(); m1(0) = 'X'.toByte
    assert(parse(m1).isEmpty, "magic not enforced")
    val m2 = good.clone(); m2(5) = 7 // w = 7
    assert(parse(m2).isEmpty, "dim multiple-of-4 not enforced")
    val m3 = good.clone(); m3(8) = 9 // qp = 9
    assert(parse(m3).isEmpty, "qp range not enforced")
    val m4 = good.clone(); m4(10 + 8 + 2) = (m4(10 + 8 + 2) ^ 0x20).toByte
    assert(parse(m4).isEmpty, "frame CRC not enforced")
    assert(parse(good.take(good.length - 3)).isEmpty, "truncation accepted")
    assert(parse(good ++ Array(0.toByte)).isEmpty, "trailing bytes accepted")
    assert(parse(Array.emptyByteArray).isEmpty)
    // corrupt the final padding bits of frame 0's payload (re-seal CRC
    // so the padding check, not the CRC, does the rejecting)
    val len0 = java.nio.ByteBuffer.wrap(good, 10, 4).getInt
    val m5 = good.clone()
    m5(10 + 8 + len0 - 1) = (m5(10 + 8 + len0 - 1) | 0x01).toByte
    val crc = new java.util.zip.CRC32
    crc.update(m5, 10 + 8, len0)
    java.nio.ByteBuffer.wrap(m5, 10 + 4, 4).putInt(crc.getValue.toInt)
    val p5 = parse(m5)
    // the flipped bit is either consumed padding (must reject) or the
    // last coefficient bit (decodes differently -> drift law catches it
    // elsewhere); assert the strict outcome when it WAS padding
    val bitsPerFrame = parse(good).get // baseline still parses
    assert(p5.isEmpty || !p5.get.frames.head
      .sameElements(bitsPerFrame.frames.head),
      "padding corruption silently ignored")
  }

  test("per-frame payload API: framePayloads + chained decodePayload " +
    "reproduce parse(encode) exactly, and decodePayload is strict " +
    "(bad prev length, corrupt bits, nonzero padding)") {
    val w = 8; val h = 8
    val frames = Seq(plane(w, h, 0), plane(w, h, 5), plane(w, h, 11))
    val viaContainer = parse(encode(frames, w, h, qp = 4)).get.frames
    val payloads = framePayloads(frames, w, h, qp = 4)
    var prev: Option[Array[Int]] = None
    payloads.zip(viaContainer).zipWithIndex.foreach {
      case ((p, want), i) =>
        val got = decodePayload(p, prev, w, h, qp = 4)
          .getOrElse(fail(s"frame $i payload did not decode"))
        assert(got.sameElements(want), s"frame $i payload decode diverged")
        prev = Some(got)
    }
    assert(decodePayload(payloads.head, Some(new Array[Int](3)), w, h, 4)
      .isEmpty, "wrong prev length accepted")
    assert(decodePayload(Array.emptyByteArray, None, w, h, 4).isEmpty)
    assert(decodePayload(payloads.head, None, 7, h, 4).isEmpty,
      "non-multiple-of-4 width accepted")
  }

  test("Exp-Golomb prefix cap (ADVICE r14): a payload with a 14+-zero " +
    "prefix rejects (no conformant encoder emits it — hostile levels " +
    "can't reach the multiply), while the encoder's true worst case " +
    "(DC level 4080 at qp=0) still decodes") {
    // 16 leading zero bits then a 1: readUe must fail at zeros > 13
    val hostile = Array[Byte](0x00, 0x00, 0x01, 0x00, 0x00, 0x00)
    assert(decodePayload(hostile, None, 4, 4, 0).isEmpty,
      "oversized Exp-Golomb prefix accepted")
    // worst legal level: all-255 P frame against an all-black recon
    // => residual 255 per pixel, DC = 16*255 = 4080 at step 1 (12
    // prefix zeros) — the cap must not clip a conformant stream
    val black = Array.fill(16)(0)
    val white = Array.fill(16)(255)
    val ps = framePayloads(Seq(black, white), 4, 4, qp = 0)
    val r0 = decodePayload(ps.head, None, 4, 4, 0)
      .getOrElse(fail("intra frame did not decode"))
    val r1 = decodePayload(ps(1), Some(r0), 4, 4, 0)
      .getOrElse(fail("max-DC P frame did not decode"))
    assert(r1.forall(_ == 255), "worst-case DC did not reconstruct")
  }

  test("motion compensation (r15): chained decodePayloadMc inverts " +
    "framePayloadsMc exactly (closed-loop, zero drift); on a panning " +
    "fixture the reachable blocks pick the pan vector and the MC " +
    "payload is STRICTLY smaller than pixel-delta; hostile vectors " +
    "reject") {
    val w = 8; val h = 8
    // f0: a textured plane; f1: f0 panned right by 1, fresh left column
    val f0 = Array.tabulate(64)(i => (i * 37 + (i * i) % 91) % 256)
    val f1 = Array.tabulate(64)(i =>
      if (i % 8 == 0) 255 - f0(i) else f0(i - 1))
    val mc = framePayloadsMc(Seq(f0, f1), w, h, qp = 4)
    // intra frame bitstream identical to the non-MC path
    val pd = framePayloads(Seq(f0, f1), w, h, qp = 4)
    assert(mc.head.payload.sameElements(pd.head), "intra frame diverged")
    assert(mc.head.mvs.isEmpty && mc(1).mvs.length === 4)
    // right-column blocks (bx=1) can reach the pan source: dx must be -1
    assert(mc(1).mvs(1) === ((-1, 0)), s"mvs: ${mc(1).mvs}")
    assert(mc(1).mvs(3) === ((-1, 0)), s"mvs: ${mc(1).mvs}")
    // the compression win: strictly smaller P payload on the pan
    assert(mc(1).payload.length < pd(1).length,
      s"MC ${mc(1).payload.length}B !< pixel-delta ${pd(1).length}B")
    // closed-loop roundtrip: chained decode == nothing lost
    val r0 = decodePayloadMc(mc.head.payload, None, w, h, 4)
      .getOrElse(fail("intra did not decode"))
    val r1 = decodePayloadMc(mc(1).payload, Some(r0), w, h, 4)
      .getOrElse(fail("MC P frame did not decode"))
    // the pan-matched half reconstructs within the distortion law of
    // the SHIFTED reference (zero residual levels there)
    val errs = r1.zip(f1).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 9, s"distortion law broke: ${errs.max}")
    // strictness: an out-of-range vector in the stream rejects. Craft
    // a stream whose first se value decodes to 3 (> McRange): ue=5 ->
    // '00110' + zero fill
    val hostile = Array[Byte](0x30, 0x00, 0x00, 0x00, 0x00, 0x00)
    assert(decodePayloadMc(hostile, Some(r0), w, h, 4).isEmpty,
      "vector outside McRange accepted")
    // out-of-plane vector: dx=-1 (se '011') then dy=0 (se '1') for the
    // FIRST block (bx=0, whose source would start at x=-1): '0111...'
    val hostile2 = Array[Byte](0x70.toByte, 0x00, 0x00, 0x00, 0x00, 0x00)
    assert(decodePayloadMc(hostile2, Some(r0), w, h, 4).isEmpty,
      "out-of-plane vector accepted")
  }

  test("q253's transcode-robustness probe survives the MC path: a " +
    "panning clip's MC qp=4 recon, RE-ENCODED through MC at qp=5, " +
    "stays within the dedup probe's k=2 dHash56 distance") {
    val w = 8; val h = 8
    val f0 = Array.tabulate(64)(i => (i * 53 + (i * i * 3) % 97) % 256)
    val f1 = Array.tabulate(64)(i =>
      if (i % 8 == 0) 255 - f0(i) else f0(i - 1))
    def dhash(p: Array[Int]): Long =
      (0 until 56).foldLeft(0L) { (a, f) =>
        val r = f / 7; val c = f % 7
        if (p(r * 8 + c) < p(r * 8 + c + 1)) a | (1L << f) else a
      }
    // generation 0: MC encode at qp=4, chain-decode
    val g0 = framePayloadsMc(Seq(f0, f1), w, h, qp = 4)
    val r0 = decodePayloadMc(g0.head.payload, None, w, h, 4).get
    val r1 = decodePayloadMc(g0(1).payload, Some(r0), w, h, 4).get
    // generation 1 (the transcode): re-encode the RECONSTRUCTIONS
    // through MC at qp=5, chain-decode
    val g1 = framePayloadsMc(Seq(r0, r1), w, h, qp = 5)
    val t0 = decodePayloadMc(g1.head.payload, None, w, h, 5).get
    val t1 = decodePayloadMc(g1(1).payload, Some(t0), w, h, 5).get
    val d = java.lang.Long.bitCount(dhash(r1) ^ dhash(t1))
    assert(d <= 2, s"MC transcode generation drifted the signature: d=$d")
  }

  test("determinism: two independent encodes of the same frames are " +
    "byte-identical (no hidden state) and parse is repeatable") {
    val w = 8; val h = 12
    val frames = Seq(plane(w, h, 0), plane(w, h, 9))
    val a = encode(frames, w, h, qp = 3)
    val b = encode(frames, w, h, qp = 3)
    assert(a.sameElements(b))
    val va = parse(a).get; val vb = parse(a).get
    va.frames.zip(vb.frames).foreach { case (x, y) =>
      assert(x.sameElements(y))
    }
  }
}
