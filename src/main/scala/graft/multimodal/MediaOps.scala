package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns (BASELINE north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * `FakeCodec.decode` is a clearly-marked deterministic STAND-IN for a
  * real decoder (it derives "pixels" from the bytes themselves). Since
  * r8 that caveat applies only to LOSSY codecs: RIFF/WAVE PCM and
  * binary PPM have REAL hand-written pure-JVM decoders (r7); PNG,
  * BMP and GIF decode through the JDK's own `javax.imageio` readers
  * (r8); and FLAC has a full hand-written encoder AND decoder (r12 —
  * fixed/LPC predictors, Rice residuals, CRC-8/16, STREAMINFO MD5
  * verify) — every lossless format, all oracle-gated end to end by
  * q188/q189/q218. JPEG also decodes with zero external jars
  * (`java.desktop` ships a reader) but its IDCT is
  * implementation-defined — not bit-deterministic across decoders — so
  * it is TOLERANCE-gated (RealCodecsSpec encodes with the JDK writer,
  * decodes with the reader, bounds mean component error) and never
  * hash-oracled. VIDEO is real at BOTH layers since r14: the
  * CONTAINER + raw-frame layer (`RealCodecs.AviCodec` hand-muxes and
  * strictly demuxes RIFF-AVI, incl. an interleaved PCM `auds` track;
  * q230/q248 hash-oracle demux + frame-sampling end to end) and the
  * lossy CODEC layer ([[IntraVideoCodec]] — 4×4 Hadamard transform
  * coding with closed-loop P frames, all-integer by design, which is
  * what lets q252 put a LOSSY codec under a hash oracle). What stays
  * out of scope is H.264 BITSTREAM compatibility (CAVLC contexts,
  * intra prediction modes, loop filter) — `FakeCodec` below remains
  * the documented marker for that non-goal. Everything around
  * the codec — the media schema, the typed Dataset API, the
  * per-partition batch shape, the partitioning story — is real Spark
  * and really tested:
  *
  *  - decode/feature-extract run in `mapPartitions` (the Scala analogue
  *    of a vectorized-batch UDF): one codec init per PARTITION, not per
  *    row — the shape that matters when the real decoder is an
  *    expensive native handle.
  *  - rows carry bytes + metadata together, so decode needs no join;
  *    a 100 TB corpus partitions by id range and decodes embarrassingly
  *    parallel with zero shuffle.
  *  - features are tiny relative to media bytes: project them out and
  *    DROP the binary column before any shuffle (see mediaFeatures —
  *    the select happens inside the map, not after).
  */
object MediaOps {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String,
                      declared_w: Int, declared_h: Int, n_frames: Int)

  /** Decoded features — small, shuffle-safe. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           byte_mean: Double, byte_max: Int,
                           frame_fingerprints: Seq[Long])

  /** STUB decoder ??? — deterministic stand-in marking the ONE declared
    * non-goal left in the media stack: H.264 BITSTREAM compatibility
    * (the transform-coding layer itself is real — [[IntraVideoCodec]],
    * hash-oracled by q252). Real deployment: replace `decode` with the
    * native library call; the mapPartitions plumbing is unchanged. */
  object FakeCodec {
    /** "Decode" = interpret the payload bytes as one unsigned-byte
      * "pixel" plane. Deterministic, codec-free. */
    def decode(bytes: Array[Byte]): Array[Int] = bytes.map(_ & 0xff)

    /** "Resize" = stride subsample to `n` samples (nearest-neighbor). */
    def resize(pixels: Array[Int], n: Int): Array[Int] =
      if (pixels.isEmpty || n <= 0) Array.empty
      else Array.tabulate(n)(i => pixels((i.toLong * pixels.length / n).toInt))

    /** "Frame sample" = split the plane into `frames` equal chunks and
      * fingerprint every `stride`-th chunk with a polynomial hash. */
    def frameSample(pixels: Array[Int], frames: Int, stride: Int): Seq[Long] = {
      if (frames <= 0 || pixels.isEmpty) return Seq.empty
      val per = math.max(pixels.length / frames, 1)
      (0 until frames by math.max(stride, 1)).map { f =>
        pixels.slice(f * per, (f + 1) * per)
          .foldLeft(0L)((h, p) => (h * 31 + p) % 1000000007L)
      }
    }
  }

  /** Attach a deterministic fake payload derived from a text column —
    * the test corpus has no real media; payload = md5(text) bytes
    * repeated 4× (64 bytes), metadata parsed from the leading bytes. */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(
        col(idCol).cast("long").as("doc_id"),
        unhex(concat(Seq.fill(4)(md5(col(textCol))): _*)).as("bytes"),
        when(col(idCol) % 3 === 0, "image/png")
          .when(col(idCol) % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"))
      .withColumn("declared_w", (conv(substring(hex(col("bytes")), 1, 2), 16, 10)).cast("int"))
      .withColumn("declared_h", (conv(substring(hex(col("bytes")), 3, 2), 16, 10)).cast("int"))
      .withColumn("n_frames", lit(8))
      .as[MediaRow]
  }

  /** Decode + feature-extract, one codec per partition; binary column is
    * dropped INSIDE the map so no shuffle ever carries payload bytes. */
  def mediaFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // real codec: init native handle here, once per partition
      rows.map { r =>
        val px = FakeCodec.decode(r.bytes)
        MediaFeatures(
          doc_id = r.doc_id,
          mime = r.mime,
          n_bytes = r.bytes.length,
          byte_mean = if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length,
          byte_max = if (px.isEmpty) 0 else px.max,
          frame_fingerprints = FakeCodec.frameSample(px, r.n_frames, stride = 2))
      }
    }
  }
}
