package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index SEGMENT MERGE (SURVEY.md §2.11a X109d, q264): the
  * compaction step a real postings store runs — new documents build a
  * small DELTA segment, and a background merge folds it into the BASE
  * so probes never fan out over an unbounded segment list (Lucene's
  * segment merging; the posting-store member of the q213/q222
  * append-then-compact family).
  *
  * Mechanics: both segments are q258-layout compressed stores (term,
  * bucket, df, bytes). The merge DECODES each side's blocks, unions
  * the postings per (term, bucket) key — segments partition the
  * corpus, so doc ids are disjoint but INTERLEAVED in sort order —
  * re-sorts by doc id and RE-ENCODES. Because the encode layout is a
  * pure function of the sorted posting multiset (gap coding has no
  * layout freedom), merged output is byte-for-byte identical to a
  * from-scratch build over the union corpus — the maintained ≡
  * rebuilt law in its strongest form, which q264 hash-gates by
  * replaying the FULL-corpus build in DuckDB (q258's oracle verbatim)
  * against the engine's merged bytes.
  *
  * Scale: one shuffle on the compact (term, bucket) key; per-key
  * state is ≤ 2 blocks of ≤ bucketWidth postings each (block size is
  * corpus-independent — the q91 sharding argument), so decode + merge
  * + re-encode is O(bucketWidth) per key. Payload bytes shuffle only
  * at block grain, never per posting. Merging more than two segments
  * is the same fold (the groupBy absorbs any segment count).
  */
object IndexSegmentMerge {

  /** Merge two (or, after a union, any number of) compressed posting
    * segments into one. Input/output schema: (term, bucket, df,
    * bytes). Strict: a corrupt block or overlapping doc ids between
    * segments throw — a merge must never silently drop or duplicate
    * a posting. */
  def merge(base: DataFrame, delta: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    base.unionByName(delta)
      .as[(String, Long, Int, Array[Byte])]
      .groupByKey { r => (r._1, r._2) }
      .mapGroups { (key: (String, Long),
                    rows: Iterator[(String, Long, Int, Array[Byte])]) =>
        val (term, bucket) = key
        val all = rows.flatMap { case (_, _, df, bytes) =>
          PostingCodec.decode(bytes, df).getOrElse(sys.error(
            s"segment merge: corrupt block for ('$term', $bucket)"))
        }.toVector.sortBy(_._1)
        require(all.map(_._1).distinct.size == all.size,
          s"segment merge: overlapping doc ids in ('$term', $bucket)")
        (term, bucket, all.size, PostingCodec.encode(all))
      }
      .toDF("term", "bucket", "df", "bytes")
  }
}
