package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sharded scatter-gather serving (SURVEY.md §2.11a X115, q283): a
  * 100 TB index never lives on one node — it is DOC-SHARDED across
  * serving nodes, a query scatters to every shard, each shard answers
  * from its own sub-index with its LOCAL top-k, and a coordinator
  * merges k·S candidate rows into the global top-k (Elasticsearch's
  * query-then-fetch, Vespa's content groups). This operator is that
  * topology made Spark-native and EXACT:
  *
  *   - Shards partition docs (shard = doc_id mod S), and a doc's BM25
  *     score is a pure function of its own (tf, dl) plus GLOBAL stats
  *     (df, N, adl) — so the true global top-k is contained in the
  *     union of per-shard top-k lists, and the merge is exact, not a
  *     recall trade (the containment law ShardedIndexSpec pins).
  *   - The per-shard reduction is the bounded [[graft.functions.TopKLong]]
  *     aggregate: map-side partial top-k, ≤ k rows per shard per
  *     mapper reach the coordinator — the scatter-gather wire cost,
  *     never the shard's full hit set (a `row_number() <= k` window
  *     partitioned by S≈4 keys would funnel each shard's entire hit
  *     stream through one task — the anti-pattern this aggregate
  *     exists to avoid).
  *   - df comes from per-shard block METADATA summed ACROSS shards
  *     before any ranking — the dfs_query_then_fetch step. This is the
  *     load-bearing production detail: per-shard df re-weights idf
  *     differently per shard and cross-shard comparisons silently
  *     skew (the default-ES footgun); `globalDf = false` exposes that
  *     wrong ranking so the spec can pin the divergence on a planted
  *     df-skewed corpus.
  *
  * Each shard's sub-index is the q258 layout (gap-coded LEB128 posting
  * blocks keyed (shard, term, bucket)) built ONLY from that shard's
  * docs, so blocks partition docs within a shard and shards partition
  * the corpus: Σ_{shard,bucket} df = global df stays a metadata-only
  * aggregate.
  *
  * Scale: the probe touches only the query terms' blocks in every
  * shard (Σ df(query terms) decoded rows, embarrassingly parallel
  * across shards); dl joins on (shard, doc_id) — co-keyed within the
  * shard, the one equi-join a serving node pays; df/adl/N broadcast;
  * the gather step is a k·S-row TakeOrdered. No window touches a
  * corpus-sized partition.
  */
object ShardedIndex {

  /** q170's exact rational BM25 per-term contribution (k1 = 6/5,
    * b = 3/4, raw-ratio RSJ idf) over tf/dl/df/n_docs/adl columns.
    * Shared with [[ReplicatedIndex]] (r16) so the replicated serve
    * scores with the identical formula. */
  private[operators] val bm25Ppm =
    """(22 * tf * adl * (2 * n_docs - 2 * df + 1) * 1000000)
       DIV ((10 * tf * adl + 3 * adl + 9 * dl) * (2 * df + 1))"""

  /** Every frame of the scatter-gather, exposed for the spec.
    * `merged` is the exact global top-k: (doc_id, score_ppm, shard). */
  final case class Served(
      store: DataFrame,    // (shard, term, bucket, df, bytes) sub-indexes
      dfreq: DataFrame,    // the df table the ranking used
      perShard: DataFrame, // (shard, doc_id, score_ppm) local top-k lists
      merged: DataFrame)   // (doc_id, score_ppm, shard) global top-k

  /** One q258-layout sub-index per shard, built as one frame — the
    * shard key IS the node boundary. Input: (shard, doc_id, text). */
  private[graft] def buildStore(sharded: DataFrame): DataFrame = {
    val s = sharded.sparkSession
    import s.implicits._
    sharded
      .select($"shard", $"doc_id", posexplode(split($"text", " ")))
      .select($"shard", $"doc_id", ($"pos" + 1).as("pos"), $"col".as("term"))
      .groupBy($"shard", $"term", $"doc_id")
      .agg(count(lit(1)).as("tf"), min($"pos").as("first_pos"))
      .groupBy($"shard", $"term", floor($"doc_id" / 100).as("bucket"))
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(Long, String, Long, Seq[(Long, Long, Long)])]
      .map { case (shard, term, bucket, ps) =>
        (shard, term, bucket, ps.size, PostingCodec.encode(ps))
      }
      .toDF("shard", "term", "bucket", "df", "bytes")
  }

  def serve(docs: DataFrame, qTerms: Seq[String], k: Int,
      nShards: Int = 4, globalDf: Boolean = true): Served = {
    val s = docs.sparkSession
    import s.implicits._
    val sharded = docs.select(
      pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
      col("doc_id"), col("text"))
    // ---- ingest: per-shard sub-indexes
    val store = buildStore(sharded)
    // doc-length sidecar, kept per shard (each node owns its docs')
    val dl = sharded.select($"shard", $"doc_id",
      size(split($"text", " ")).cast(LongType).as("dl"))
    // corpus stats are GLOBAL by definition (N, adl)
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"), sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    // ---- scatter: every shard fetches its own query-term blocks
    val probed = store.filter($"term".isin(qTerms: _*))
    // df: global = metadata summed ACROSS shards (dfs_query_then_fetch);
    // per-shard = the documented footgun, kept only for the spec's
    // divergence pin
    val dfreq =
      if (globalDf)
        probed.groupBy($"term").agg(sum($"df").cast(LongType).as("df"))
      else
        probed.groupBy($"shard", $"term")
          .agg(sum($"df").cast(LongType).as("df"))
    val decoded = probed
      .select($"shard", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (shard, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"sharded probe: corrupt postings block $shard/'$t'/$b"))
          .map { case (doc, tf, _) => (shard, t, doc, tf) }
      }.toDF("shard", "term", "doc_id", "tf")
    val withDf =
      if (globalDf) decoded.join(broadcast(dfreq), "term")
      else decoded.join(broadcast(dfreq), Seq("shard", "term"))
    val scored = withDf
      .join(dl, Seq("shard", "doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib_ppm", expr(bm25Ppm))
      .groupBy($"shard", $"doc_id").agg(sum($"contrib_ppm").as("score_ppm"))
    // ---- per-shard local top-k: bounded exact-Long aggregate
    val topK = udaf(new graft.functions.TopKLong(k))
    val perShard = scored.groupBy($"shard")
      .agg(topK($"score_ppm", $"doc_id", lit(0L)).as("tk"))
      .select($"shard", explode($"tk").as("e"))
      .select($"shard", $"e.id".as("doc_id"), $"e.score".as("score_ppm"))
    // ---- gather: merge k·S candidate rows into the global top-k
    val merged = perShard
      .orderBy($"score_ppm".desc, $"doc_id").limit(k)
      .select($"doc_id", $"score_ppm", $"shard")
    Served(store, dfreq, perShard, merged)
  }
}
