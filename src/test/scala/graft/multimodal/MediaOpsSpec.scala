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
}
