package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Postings takedown (SURVEY.md §2.11a X109g, q274): the DELETE member
  * of the compressed posting store's maintenance family — q258 builds,
  * q264 merges (append), T31 streams; removing a document (the
  * right-to-be-forgotten event the q233/q234/q245 reaper family
  * serves) was missing for the TEXT index's storage layer.
  *
  * The surgery is BLOCK-LOCAL: doc ids bucket by doc_id div 100
  * (q91's layout), so a takedown touches exactly the blocks of the
  * dead docs' buckets — each decodes (strict), drops the dead
  * postings, and re-encodes; a block left empty vanishes; every other
  * block passes through byte-UNTOUCHED (no decode, no re-encode — the
  * law PostingsTakedownSpec pins object-level). Gap coding has no
  * layout freedom, so the result equals a from-scratch build over the
  * surviving corpus BYTE FOR BYTE — the maintained ≡ rebuilt law in
  * its strongest form, and q274's oracle replays exactly that build
  * (the takedown never enters the oracle).
  *
  * Scale: the dead set groups to (bucket → dead ids) — bucket-count
  * bounded fan-in, each array ≤ bucket width; the join against the
  * store is an equi-join on the compact bucket key (no forced
  * broadcast — at takedown scale AQE decides); re-encode cost is
  * |touched blocks| × block width, never corpus-shaped. */
object PostingsTakedown {

  /** Remove `deadIds` (a 1-column doc_id frame) from a q258-layout
    * store (term, bucket, df, bytes). Unknown ids are no-ops. */
  def apply(store: DataFrame, deadIds: DataFrame): DataFrame = {
    val s = store.sparkSession
    import s.implicits._
    val dead = deadIds
      .select(col(deadIds.columns.head).cast("long").as("doc_id"))
      .distinct()
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    store.join(dead, Seq("bucket"), "left")
      .select($"term", $"bucket", $"df", $"bytes", $"dead")
      .as[(String, Long, Int, Array[Byte], Option[Seq[Long]])]
      .flatMap {
        case (t, b, n, bytes, None) =>
          // bucket untouched: bytes pass through, never re-coded
          Iterator.single((t, b, n, bytes))
        case (t, b, n, bytes, Some(dd)) =>
          val ps = PostingCodec.decode(bytes, n)
            .getOrElse(throw new IllegalStateException(
              s"postings takedown: corrupt block '$t'/$b"))
          val gone = dd.toSet
          val kept = ps.filterNot(p => gone.contains(p._1))
          if (kept.isEmpty) Iterator.empty
          else Iterator.single(
            (t, b, kept.size, PostingCodec.encode(kept)))
      }
      .toDF("term", "bucket", "df", "bytes")
  }
}
