package graft.multimodal

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpecBase {

  private lazy val media = MediaOps.attachFakeMedia(
    spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")

  test("media schema: opaque binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("bytes").dataType.typeName === "binary")
    assert(sch("mime").dataType.typeName === "string")
    assert(sch("declared_w").dataType.typeName === "integer")
    val r = media.head()
    assert(r.bytes.length === 64)   // md5 x4
    assert(Set("image/png", "audio/wav", "video/mp4")(r.mime))
  }

  test("feature extraction is deterministic and drops the payload") {
    val f1 = MediaOps.mediaFeatures(media).collect().sortBy(_.doc_id)
    val f2 = MediaOps.mediaFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)   // partitioning-invariant
    assert(!MediaOps.mediaFeatures(media).schema.fieldNames.contains("bytes"))
    assert(f1.head.frame_fingerprints.length === 4)   // 8 frames, stride 2
  }

  test("codec stubs: resize subsamples, frame-sample strides") {
    val px = (0 until 64).toArray
    assert(MediaOps.FakeCodec.resize(px, 8).length === 8)
    assert(MediaOps.FakeCodec.resize(px, 8).head === 0)
    assert(MediaOps.FakeCodec.resize(Array.empty, 8).isEmpty)
    assert(MediaOps.FakeCodec.frameSample(px, 8, 2).length === 4)
    assert(MediaOps.FakeCodec.frameSample(Array.empty, 8, 2).isEmpty)
  }

  test("real media path (r15): attachRealMedia mints genuine GRF1-AVI " +
    "and ADPCM-WAV files, mediaFeatures decodes them for real (features " +
    "== direct codec arithmetic), and FakeCodec serves ONLY the h264 " +
    "mime; a corrupt compressed payload throws at decode") {
    import spark.implicits._
    val docs = Seq((0L, "video doc"), (1L, "audio doc"), (2L, "stub doc"))
      .toDF("doc_id", "text")
    val rm = MediaOps.attachRealMedia(docs, "doc_id", "text")
      .collect().sortBy(_.doc_id)
    assert(rm.map(_.mime).toSeq === Seq(MediaOps.GrfMime,
      MediaOps.AdpcmMime, MediaOps.H264Mime))
    // the video payload is a real compressed AVI the strict demux accepts
    val dm = RealCodecs.AviCodec.parseCompressed(rm(0).bytes)
    assert(dm.isDefined && dm.get.qp === 4 && dm.get.payloads.size === 2)
    // the audio payload is a real ADPCM WAV the strict parser accepts
    val ad = RealCodecs.AdpcmCodec.parse(rm(1).bytes)
    assert(ad.isDefined && ad.get.samples.length === 346)
    val feats = MediaOps.mediaFeatures(
      MediaOps.attachRealMedia(docs, "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    // video features == arithmetic over the chain-decoded planes
    var prev: Option[Array[Int]] = None
    val planes = dm.get.payloads.map { p =>
      val r = IntraVideoCodec.decodePayload(p, prev, 8, 8, 4).get
      prev = Some(r); r
    }
    val px = planes.flatten
    def ph(a: Array[Int]) =
      a.foldLeft(0L)((h, p) => (h * 31 + p) % 1000000007L)
    assert(feats(0).n_bytes === rm(0).bytes.length)
    assert(feats(0).byte_mean === px.map(_.toLong).sum.toDouble / px.length)
    assert(feats(0).byte_max === px.max)
    assert(feats(0).frame_fingerprints === planes.map(ph))
    // audio features == arithmetic over the decoded samples
    val s = ad.get.samples
    assert(feats(1).byte_mean === s.map(_.toLong).sum.toDouble / s.length)
    assert(feats(1).byte_max === s.max)
    assert(feats(1).frame_fingerprints === Seq(ph(s)))
    // stub branch: unchanged FakeCodec arithmetic over the raw bytes
    val spx = MediaOps.FakeCodec.decode(rm(2).bytes)
    assert(feats(2).byte_max === spx.max)
    assert(feats(2).frame_fingerprints
      === MediaOps.FakeCodec.frameSample(spx, 8, 2))
    // corrupt a video payload (8 trailing garbage bytes, re-muxed so
    // the CONTAINER stays valid): the strict codec chain must THROW
    val corrupt = MediaOps.attachRealMedia(docs, "doc_id", "text")
      .map { r =>
        if (r.mime == MediaOps.GrfMime) {
          val d = RealCodecs.AviCodec.parseCompressed(r.bytes).get
          val ps = d.payloads.updated(0,
            d.payloads.head ++ Array.fill(8)(0x55.toByte))
          r.copy(bytes = RealCodecs.AviCodec
            .synthesizeCompressed(ps, d.width, d.height, d.qp, 100000))
        } else r
      }(org.apache.spark.sql.Encoders.product[MediaOps.MediaRow])
    val e = intercept[Exception] {
      MediaOps.mediaFeatures(corrupt).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).map(_.toString).mkString(" | ")
    assert(chain.contains("mediaFeatures:"), chain)
  }
}
