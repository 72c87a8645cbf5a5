package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.multimodal.MediaOps

/** Multimodal pipeline queries (BASELINE north-star). The Spark side
  * runs the REAL typed path — binary payload column → mapPartitions
  * decode (stubbed codec) → features; the DuckDB oracle recomputes the
  * same arithmetic from md5 hex (it can, because the fake payload is
  * md5-derived — that is exactly why the stub was designed that way:
  * the full binary→decode→feature plumbing gets a hash-exact check).
  */
object Multimodal {

  /** DuckDB expr for unsigned byte i (1-based, of the 64-byte payload =
    * md5(text) ×4): repeats every 16 bytes. */
  private def byteSql(i: String): String =
    s"CAST(('0x' || substr(md5(text), ((($i - 1) % 16) * 2) + 1, 2)) AS INT)"

  /** q61 — media feature extraction over the fake-media corpus:
    * decode → byte stats + strided frame fingerprints. */
  val q61 = Q(
    "q61_media_features",
    (s, dir) => {
      val media = MediaOps.attachFakeMedia(
        Tables(s, dir, "documents"), "doc_id", "text")
      MediaOps.mediaFeatures(media).toDF()
        .withColumn("frame_fingerprints",
          array_join(transform(col("frame_fingerprints"),
            f => f.cast(org.apache.spark.sql.types.StringType)), "|"))
        .orderBy(col("doc_id"))
    },
    Some {
      // frame f (of 8, stride 2 -> f in 0,2,4,6), 8 bytes each:
      // poly hash h = fold((h*31+p) % 1000000007) — list_reduce's
      // implicit first-element seed equals foldLeft(0)'s first step.
      def frame(f: Int): String =
        s"list_reduce(list_transform(range(${f * 8 + 1}, ${f * 8 + 9}), i -> " +
          s"CAST(${byteSql("i")} AS BIGINT)), (h, p) -> (h * 31 + p) % 1000000007)"
      val frames = Seq(0, 2, 4, 6)
        .map(f => s"CAST(${frame(f)} AS VARCHAR)")
        .mkString("array_to_string([", ", ", "], '|')")
      s"""
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             64 AS n_bytes,
             CAST(list_sum(list_transform(range(1, 65), i -> ${byteSql("i")})) AS DOUBLE) / 64 AS byte_mean,
             list_max(list_transform(range(1, 17), i -> ${byteSql("i")})) AS byte_max,
             $frames AS frame_fingerprints
      FROM documents ORDER BY doc_id"""
    },
    doc = "multimodal: binary payload -> mapPartitions decode (stub codec) -> features; " +
      "payload bytes never cross a shuffle")

  val all: Seq[Q] = Seq(q61)
}
