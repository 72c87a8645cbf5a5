package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL media codecs for the two formats that need no native library —
  * RIFF/WAVE PCM audio and binary PPM (P6) images — upgrading the
  * multimodal path from "all decode is a stub" ([[MediaOps.FakeCodec]])
  * to "real decode where the container allows it, stub only for
  * formats that genuinely need codec jars" (JPEG/H.264/FLAC stay
  * stubbed — documented in MediaOps).
  *
  * Both parsers are defensive: any malformed input — wrong magic,
  * truncated chunk, unsupported encoding — returns None rather than
  * throwing or mis-reading, because at 100 TB a corpus WILL contain
  * garbage rows and a decode-stage crash loses the whole task.
  * Synthesizers build genuine on-spec files from a seed, so the
  * synthesize→parse roundtrip exercises every header field end-to-end
  * (RealCodecsSpec) and q188's DuckDB twin can recompute the decoded
  * features from the same seed arithmetic WITHOUT parsing bytes — a
  * hash-exact oracle over a real binary decode path.
  */
object RealCodecs {

  /** RIFF/WAVE, PCM. Parser walks the chunk list (fmt / data, skipping
    * unknown chunks with even-padding per spec); supports 16-bit mono
    * PCM — the synthesis target — and rejects everything else loudly
    * via None. */
  object WavCodec {
    final case class Wav(sampleRate: Int, channels: Int, bits: Int,
                         samples: Array[Int])

    /** A genuine 44-byte-header WAV: 16-bit mono PCM at `sampleRate`,
      * sample i = (seed[i mod seed.len] − 128) · 256 — full-scale-ish
      * deterministic audio derived from the seed bytes. */
    def synthesize(seed: Array[Byte], nSamples: Int = 64,
                   sampleRate: Int = 8000): Array[Byte] = {
      require(seed.nonEmpty, "seed must be non-empty")
      val dataLen = nSamples * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1.toShort)              // PCM
      buf.putShort(1.toShort)              // mono
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * 2)           // byte rate = sr * ch * bits/8
      buf.putShort(2.toShort)              // block align
      buf.putShort(16.toShort)             // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        buf.putShort((((seed(i % seed.length) & 0xff) - 128) * 256).toShort)
        i += 1
      }
      buf.array()
    }

    def parse(bytes: Array[Byte]): Option[Wav] = {
      if (bytes.length < 12) return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag4(): String = {
        val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
      }
      if (tag4() != "RIFF") return None
      buf.getInt // riff size; trust the chunk walk, not this
      if (tag4() != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[Array[Byte]] = None
      while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
        val id = tag4()
        val sz = buf.getInt
        if (sz < 0 || sz > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (sz < 16) return None
            val p0 = buf.position()
            val audioFormat = buf.getShort & 0xffff
            val channels = buf.getShort & 0xffff
            val rate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            val bits = buf.getShort & 0xffff
            if (audioFormat != 1) return None // PCM only
            fmt = Some((channels, rate, bits))
            // a chunk ending exactly at EOF has no room for its pad
            // byte — clamp, don't throw past the limit
            buf.position(math.min(p0 + sz + (sz & 1), buf.limit()))
          case "data" =>
            val d = new Array[Byte](sz); buf.get(d)
            if ((sz & 1) == 1 && buf.remaining() > 0) buf.get() // pad byte
            data = Some(d)
          case _ =>
            val skip = sz + (sz & 1)
            if (skip > buf.remaining()) return None
            buf.position(buf.position() + skip)
        }
      }
      for {
        (channels, rate, bits) <- fmt
        d <- data
        if channels == 1 && bits == 16 && d.length % 2 == 0
      } yield {
        val sb = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
        val samples = Array.fill(d.length / 2)(sb.getShort.toInt)
        Wav(rate, channels, bits, samples)
      }
    }
  }

  /** Binary PPM (P6): ASCII header (magic, width, height, maxval —
    * whitespace-separated, `#` comments legal anywhere between tokens)
    * followed by w·h·3 binary RGB bytes. */
  object PpmCodec {
    final case class Ppm(width: Int, height: Int, maxVal: Int,
                         rgb: Array[Int]) // unsigned, row-major RGB

    /** A genuine P6 file: w×h, maxval 255, RGB plane = seed bytes
      * repeated to length w·h·3. */
    def synthesize(seed: Array[Byte], w: Int = 8, h: Int = 8): Array[Byte] = {
      require(seed.nonEmpty, "seed must be non-empty")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val body = Array.tabulate(w * h * 3)(i => seed(i % seed.length))
      header ++ body
    }

    def parse(bytes: Array[Byte]): Option[Ppm] = {
      var pos = 0
      def skipSpaceAndComments(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val c = bytes(pos).toChar
          if (c.isWhitespace) pos += 1
          else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else go = false
        }
      }
      def token(): Option[String] = {
        skipSpaceAndComments()
        val start = pos
        while (pos < bytes.length && !bytes(pos).toChar.isWhitespace &&
          bytes(pos) != '#') pos += 1
        if (pos > start) Some(new String(bytes, start, pos - start, "US-ASCII"))
        else None
      }
      def intToken(): Option[Int] =
        token().flatMap(t => scala.util.Try(t.toInt).toOption).filter(_ > 0)
      for {
        magic <- token() if magic == "P6"
        w <- intToken()
        h <- intToken()
        maxVal <- intToken() if maxVal <= 255 // 1-byte samples only
        // exactly ONE whitespace byte separates maxval from binary data
        _ <- if (pos < bytes.length && bytes(pos).toChar.isWhitespace) {
          pos += 1; Some(())
        } else None
        // Long math: a malicious "50000 50000" header wraps w*h*3
        // negative (crash) or — worse — to 0 (silent empty mis-read)
        // in Int; either way it must be a None, per the contract above
        nPx = w.toLong * h * 3L
        if nPx <= bytes.length - pos
      } yield Ppm(w, h, maxVal,
        Array.tabulate(nPx.toInt)(i => bytes(pos + i) & 0xff))
    }
  }
}
