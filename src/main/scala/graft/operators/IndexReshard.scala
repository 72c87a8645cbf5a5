package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Consistent-hash index reshard (SURVEY.md §2.11a X115b, q288):
  * the storage-growth operation a 100 TB sharded index (q283's
  * topology) actually runs. q162 AUDITS the movement matrix; this
  * operator DOES the move on the index's storage layer: add one shard
  * to the md5 ring (16 vnodes, q162's exact hash so the two rows
  * share one geometry), and rebuild ONLY what the ring says moved —
  * never the corpus, never the unmoved blocks.
  *
  * The consistent-hashing guarantee does the heavy lifting: adding a
  * shard's vnodes can only REDIRECT a doc to the NEW shard (its
  * clockwise-next vnode either stays or becomes one of the new
  * vnodes — wrap-around included, since a changed wrap target is
  * itself a new vnode), so the surgery is exactly two block-local
  * passes:
  *
  *   - old shards: the moved docs' buckets' blocks decode (strict),
  *     drop the movers, re-encode — q274's takedown surgery with the
  *     shard in the block key; emptied blocks vanish; every other
  *     block passes through byte-UNTOUCHED (no decode);
  *   - new shard: its sub-index builds from the moved docs alone
  *     (every doc assigned to it at S+1 is a mover, by the guarantee).
  *
  * Gap coding has no layout freedom, so maintained ≡ a from-scratch
  * S+1-ring build BYTE FOR BYTE — q288's oracle replays exactly that
  * build (ring assignment + q258 expansion; the surgery never enters
  * it), and IndexReshardSpec pins the only-to-new-shard law, the
  * untouched-block object identity, and the ~1/(S+1) movement bound.
  *
  * Scale: the ring is S·16 rows, broadcast; assignment is one
  * as-of-shaped join per doc (q162's device) paid at ingest; the
  * reshard touches |moved docs' buckets| blocks on the old shards
  * plus one delta build over the movers — ~1/(S+1) of the corpus,
  * the whole point of the ring (a modulo reshard re-keys ~all docs
  * and would rebuild every block, q162's measured contrast). */
object IndexReshard {

  final case class Reshard(
      assignments: DataFrame, // (doc_id, shard_old, shard_new)
      oldStore: DataFrame,    // (shard, term, bucket, df, bytes) at S
      newStore: DataFrame)    // (shard, term, bucket, df, bytes) at S+1

  /** q162's md5 ring: 16 vnodes per shard, positions in [0, 2⁶⁰). */
  private def ring(spark: org.apache.spark.sql.SparkSession,
      shards: Int): DataFrame = {
    import spark.implicits._
    (0 until shards).flatMap(sh => (0 until 16).map(v => (sh, sh + ":" + v)))
      .toDF("shard", "sv")
      .select($"shard",
        conv(substring(md5(concat(lit("shard"), $"sv")), 1, 15), 16, 10)
          .cast(LongType).as("pos"))
  }

  /** Clockwise-next-vnode assignment (q162's as-of-shaped device):
    * smallest vnode pos ≥ the doc's pos, wrapping to the ring's
    * global minimum. Input needs a `p` position column. */
  private def assign(docs: DataFrame, shards: Int,
      outCol: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val r = ring(s, shards)
    val wrap = r.orderBy($"pos".asc, $"shard".asc).limit(1)
      .select($"shard".as("wrap_shard"))
    val best = docs.select($"doc_id", $"p").join(broadcast(r), $"pos" >= $"p")
      .groupBy($"doc_id")
      .agg(min(struct($"pos", $"shard")).as("m"))
      .select($"doc_id", $"m.shard".as(outCol))
    docs.join(best, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(wrap))
      .withColumn(outCol, coalesce(col(outCol), $"wrap_shard"))
      .drop("wrap_shard")
  }

  /** Reshard a ring-sharded q258 store from `oldShards` to
    * `oldShards + 1` shards via block-local surgery. */
  def reshard(docs: DataFrame, oldShards: Int): Reshard = {
    val s = docs.sparkSession
    import s.implicits._
    val positioned = docs.select($"doc_id", $"text",
      conv(substring(md5(concat(lit("doc"), $"doc_id".cast(StringType))),
        1, 15), 16, 10).cast(LongType).as("p"))
    val a = assign(assign(positioned, oldShards, "shard_old"),
      oldShards + 1, "shard_new")
    val oldStore = ShardedIndex.buildStore(
      a.select($"shard_old".as("shard"), $"doc_id", $"text"))
    val moved = a.filter($"shard_old" =!= $"shard_new")
    // ---- old-shard surgery: q274's block-local delete, shard-keyed
    val deadByBlock = moved
      .groupBy($"shard_old".as("shard"), expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    val survived = oldStore
      .join(deadByBlock, Seq("shard", "bucket"), "left")
      .select($"shard", $"term", $"bucket", $"df", $"bytes", $"dead")
      .as[(Long, String, Long, Int, Array[Byte], Option[Seq[Long]])]
      .flatMap {
        case (sh, t, b, n, bytes, None) =>
          // block untouched: bytes pass through, never re-coded
          Iterator.single((sh, t, b, n, bytes))
        case (sh, t, b, n, bytes, Some(dd)) =>
          val ps = PostingCodec.decode(bytes, n)
            .getOrElse(throw new IllegalStateException(
              s"index reshard: corrupt block $sh/'$t'/$b"))
          val gone = dd.toSet
          val kept = ps.filterNot(p => gone.contains(p._1))
          if (kept.isEmpty) Iterator.empty
          else Iterator.single((sh, t, b, kept.size, PostingCodec.encode(kept)))
      }
      .toDF("shard", "term", "bucket", "df", "bytes")
    // ---- new shard: delta build over the movers only
    val added = ShardedIndex.buildStore(
      moved.select($"shard_new".as("shard"), $"doc_id", $"text"))
    Reshard(a.select($"doc_id", $"shard_old", $"shard_new"),
      oldStore, survived.unionByName(added))
  }
}
