package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL media codecs needing no library beyond the JDK — RIFF/WAVE PCM
  * audio and binary PPM (P6) images parsed by hand (r7), plus PNG and
  * BMP encoded by hand and decoded through `javax.imageio.ImageIO`
  * (r8; `java.desktop` ships PNG/BMP/GIF/JPEG readers, zero external
  * jars) — upgrading the multimodal path from "all decode is a stub"
  * ([[MediaOps.FakeCodec]]) to "real decode for every LOSSLESS format".
  * Only lossy codecs whose decode is implementation-defined stay
  * stubbed (JPEG's IDCT, H.264, lossy audio): they are decodable on
  * the JVM but not bit-deterministic across implementations, so they
  * belong behind a tolerance gate, not a hash oracle — documented in
  * MediaOps.
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

  /** Decoded image in canonical form: row-major `[r,g,b, r,g,b, ...]`
    * components, extracted via `BufferedImage.getRGB` so the layout is
    * independent of the on-disk row order / channel order — which is
    * exactly what lets the q189 oracle catch a bottom-up or BGR mix-up
    * in the encoders below. */
  final case class Img(width: Int, height: Int, comps: Array[Int])

  /** The JDK's own image decoder (`javax.imageio`), wrapped to the same
    * defensive contract as the hand parsers: any malformed input —
    * wrong magic, truncated stream, no registered reader — is a None,
    * never a throw. This is a genuinely INDEPENDENT decode
    * implementation from the encoders in [[PngCodec]]/[[BmpCodec]], so
    * encode-by-hand → ImageIO-decode is a real differential test, not
    * a library talking to itself. */
  object ImageIoCodec {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no tmp-file scratch per decode

    def decode(bytes: Array[Byte]): Option[Img] =
      scala.util.Try(
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))).toOption.flatten
        .map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val comps = new Array[Int](w * h * 3)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              comps(i) = (v >> 16) & 0xff
              comps(i + 1) = (v >> 8) & 0xff
              comps(i + 2) = v & 0xff
              i += 3
              x += 1
            }
            y += 1
          }
          Img(w, h, comps)
        }
  }

  /** Hand-rolled PNG encoder (RFC 2083): signature + IHDR + one IDAT +
    * IEND, each chunk CRC32-sealed; 8-bit truecolor (color type 2), no
    * interlace, every scanline filter 0, zlib via `java.util.Deflater`.
    * Pixel plane = seed bytes repeated row-major across the image, the
    * same arithmetic the q189 DuckDB twin recomputes. */
  object PngCodec {
    private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(12 + body.length) // PNG is big-endian
      buf.putInt(body.length)
      val tb = tag.getBytes("US-ASCII")
      buf.put(tb).put(body)
      val crc = new java.util.zip.CRC32
      crc.update(tb)
      crc.update(body)
      buf.putInt(crc.getValue.toInt)
      buf.array()
    }

    def synthesize(seed: Array[Byte], w: Int = 9, h: Int = 7): Array[Byte] = {
      require(seed.nonEmpty, "seed must be non-empty")
      synthesizeComps(
        Array.tabulate(w * h * 3)(i => seed(i % seed.length) & 0xff), w, h)
    }

    /** Encode an EXPLICIT row-major `[r,g,b,...]` component plane
      * (values 0–255, length w·h·3) — the seed form above is the
      * `comps(i) = seed(i mod len)` special case. Lets callers (q217's
      * perceptual-hash corpus) perturb individual pixels and still run
      * the real encode→ImageIO-decode path. */
    def synthesizeComps(comps: Array[Int], w: Int, h: Int): Array[Byte] = {
      require(comps.length == w * h * 3,
        s"PngCodec: need ${w * h * 3} components, got ${comps.length}")
      val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
        0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte)             // bit depth 8, truecolor
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      // raw image stream: per scanline, 1 filter byte (0 = None) + w*3
      // samples; sample index runs row-major across the WHOLE image
      val raw = new Array[Byte](h * (1 + w * 3))
      var p = 0
      var px = 0
      var y = 0
      while (y < h) {
        raw(p) = 0
        p += 1
        var x = 0
        while (x < w * 3) {
          raw(p) = comps(px).toByte
          p += 1; px += 1; x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw)
      deflater.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](512)
      while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      sig ++ chunk("IHDR", ihdr.array()) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
  }

  /** Hand-rolled 24-bit uncompressed BMP (BITMAPINFOHEADER): rows
    * stored BOTTOM-UP in BGR order, padded to 4-byte boundaries — three
    * container quirks the decoder must undo, all caught by q189's
    * position/channel-sensitive pixel hash if either side gets one
    * wrong. Logical (top-down, RGB) pixel content = seed bytes repeated
    * row-major, identical to [[PngCodec]]. */
  object BmpCodec {
    def synthesize(seed: Array[Byte], w: Int = 9, h: Int = 7): Array[Byte] = {
      require(seed.nonEmpty, "seed must be non-empty")
      synthesizeComps(
        Array.tabulate(w * h * 3)(i => seed(i % seed.length) & 0xff), w, h)
    }

    /** Explicit component-plane form — see [[PngCodec.synthesizeComps]];
      * same logical (top-down, RGB) content, stored bottom-up BGR. */
    def synthesizeComps(comps: Array[Int], w: Int, h: Int): Array[Byte] = {
      require(comps.length == w * h * 3,
        s"BmpCodec: need ${w * h * 3} components, got ${comps.length}")
      val rowSize = ((w * 3 + 3) / 4) * 4 // each stored row pads to 4 bytes
      val dataLen = rowSize * h
      val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
        .putShort(0).putShort(0).putInt(54)      // reserved, pixel offset
      buf.putInt(40).putInt(w).putInt(h)         // positive height = bottom-up
        .putShort(1).putShort(24)                // planes, bpp
        .putInt(0).putInt(dataLen)               // BI_RGB, image size
        .putInt(2835).putInt(2835)               // 72 dpi
        .putInt(0).putInt(0)                     // palette unused
      var sy = h - 1                             // stored order: last logical row first
      while (sy >= 0) {
        var x = 0
        while (x < w) {
          val base = (sy * w + x) * 3
          val r = comps(base).toByte
          val g = comps(base + 1).toByte
          val b = comps(base + 2).toByte
          buf.put(b).put(g).put(r)               // stored channel order is BGR
          x += 1
        }
        var pad = rowSize - w * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        sy -= 1
      }
      buf.array()
    }
  }

  /** Hand-rolled GIF89a (the CompuServe spec): logical screen
    * descriptor + 16-entry global color table + one image with a REAL
    * LZW-coded data stream — emitted in the spec's "literal" regime
    * (a CLEAR code before every run of <= 12 root codes keeps the
    * variable code width pinned at minCodeSize + 1, so the encoder
    * never tracks a string table yet produces a fully conformant
    * stream any LZW decoder must table-decode). Sub-block framing,
    * LSB-first bit packing, and the 5-bit code boundary are all
    * exercised for the ImageIO reader to undo.
    *
    * Pixel content: GIF is palette-indexed, and the shared seed
    * arithmetic (component i = seed((i-1) mod 16), row-major r,g,b,
    * [[PngCodec]]/[[BmpCodec]]) makes pixel p's triple a function of
    * p mod 16 only (3·16 ≡ 0 mod 16) — exactly 16 distinct triples, so
    * a 16-entry palette with index p mod 16 reproduces the SAME image
    * the q189 DuckDB twin recomputes, unchanged, from seed bytes. */
  object GifCodec {
    def synthesize(seed: Array[Byte], w: Int = 9, h: Int = 7): Array[Byte] = {
      require(seed.nonEmpty, "seed must be non-empty")
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF89a".getBytes("US-ASCII"))
      u16(w); u16(h)
      out.write(0xf3) // GCT present, 8-bit color res, GCT size 2^(3+1)=16
      out.write(0)    // background color index
      out.write(0)    // square pixels
      var j = 0
      while (j < 16) { // palette entry j = triple of any pixel p ≡ j (mod 16)
        out.write(seed((3 * j) % seed.length) & 0xff)
        out.write(seed((3 * j + 1) % seed.length) & 0xff)
        out.write(seed((3 * j + 2) % seed.length) & 0xff)
        j += 1
      }
      out.write(0x2c) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0)    // no local table, not interlaced
      val minCode = 4 // 16 roots
      out.write(minCode)
      val clear = 1 << minCode
      val end = clear + 1
      val width = minCode + 1
      // LSB-first bit packer over the code stream
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nAcc = 0
      def emit(code: Int): Unit = {
        acc |= code.toLong << nAcc
        nAcc += width
        while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
      }
      var p = 0
      val n = w * h
      while (p < n) {
        emit(clear) // reset the decoder's table: width stays at 5 bits
        var run = 0
        while (run < 12 && p < n) { emit(p % 16); run += 1; p += 1 }
      }
      emit(end)
      if (nAcc > 0) bits.write((acc & 0xff).toInt)
      val stream = bits.toByteArray
      var off = 0
      while (off < stream.length) { // 255-byte-max length-prefixed sub-blocks
        val len = math.min(255, stream.length - off)
        out.write(len)
        out.write(stream, off, len)
        off += len
      }
      out.write(0)    // block terminator
      out.write(0x3b) // trailer
      out.toByteArray
    }
  }
}
