package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shard REPLICATION + failover serving (SURVEY.md §2.11a X119, q294):
  * the availability half of the q283/q288 sharded topology. Every
  * shard there lives on exactly one node — a node loss loses the
  * shard, which no production search tier accepts (Elasticsearch
  * `number_of_replicas`, Vespa content groups, Dynamo/Cassandra
  * replica sets). This operator gives every document TWO distinct
  * homes and makes serving routable to either:
  *
  *   - PLACEMENT is the Dynamo preference-list rule on q288's md5
  *     ring (16 vnodes/shard, q162's exact hash): walk clockwise from
  *     the doc's position — the first vnode's shard is the PRIMARY
  *     (identical to [[IndexReshard.assign]], the compat law the spec
  *     pins), the first vnode of a DIFFERENT shard is the REPLICA.
  *     Per-doc placement (not per-shard) spreads a dead node's load
  *     across ALL survivors instead of doubling one neighbor's — the
  *     consistent-hashing argument applied to failover fan-in.
  *   - The WRITE PATH emits both copies: the primary store is the
  *     q258/q283 layout keyed (shard, term, bucket); the replica
  *     store is keyed (node, origin, term, bucket) where `origin` is
  *     the doc's primary shard — so "serve shard p from replicas" is
  *     a pure KEY-SPACE selection (origin = p), no decode, no
  *     recompute, and every origin-p replica block lives on a node ≠ p
  *     by construction (primary ≠ replica per doc).
  *   - FAILOVER of node x serves: primary blocks of every node ≠ x
  *     UNION replica blocks with origin = x. That selection PARTITIONS
  *     the corpus (docs with primary ≠ x once via their primary; docs
  *     with primary = x once via their replica, which is ≠ x), so df
  *     summed over the selection's block metadata stays the exact
  *     global df and BM25 scores are unchanged — failover is answer-
  *     INVARIANT, the law q294 hash-gates and the spec pins for EVERY
  *     choice of failed node.
  *
  * Byte law: canonical gap coding means the replica copy is not just
  * score-equivalent but byte-reconstructible — decode-union-encode of
  * one (origin, term, bucket)'s replica blocks across nodes equals the
  * primary block byte for byte (ReplicatedIndexSpec).
  *
  * Scale: placement is one broadcast join against the 2·S·16-row
  * doubled ring (doubling unrolls the wrap-around so "first distinct
  * clockwise" needs no branch); the write path is two [[ShardedIndex]]
  * builds (the 2× ingest cost replication always costs); every serve
  * probes only the query terms' blocks in the routed selection, with
  * the per-node reduction a bounded map-side [[graft.functions.TopKLong]]
  * (≤ k rows per node per mapper) and a k·S-row gather — q283's wire
  * posture, unchanged by replication. */
object ReplicatedIndex {

  final case class Replicated(
      assignments: DataFrame,  // (doc_id, primary, replica), primary != replica
      primaryStore: DataFrame, // (shard, term, bucket, df, bytes)
      replicaStore: DataFrame, // (node, origin, term, bucket, df, bytes)
      dl: DataFrame,           // (doc_id, dl) — the doc-stats sidecar
      stats: DataFrame)        // (n_docs, adl) — global corpus stats

  /** Dynamo preference list of length 2 on the md5 ring: input needs
    * (doc_id, p); output adds (primary, replica). The ring is DOUBLED
    * (each vnode again at pos + 2⁶⁰, one past the 15-hex position
    * domain) so the clockwise walk from any p is a plain ORDER BY over
    * rpos ≥ p — wrap-around included, no COALESCE branch. */
  private[graft] def assignPR(docs: DataFrame, shards: Int): DataFrame = {
    require(shards >= 2, s"replication needs >= 2 shards, got $shards")
    val s = docs.sparkSession
    import s.implicits._
    val r = IndexReshard.ring(s, shards)
    val doubled = r.select($"shard", $"pos".as("rpos"))
      .unionByName(r.select($"shard", ($"pos" + lit(1L << 60)).as("rpos")))
    val cands = docs.select($"doc_id", $"p")
      .join(broadcast(doubled), $"rpos" >= $"p")
    val prim = cands.groupBy($"doc_id")
      .agg(min(struct($"rpos", $"shard")).as("m"))
      .select($"doc_id", $"m.shard".as("primary"))
    val repl = cands.join(prim, "doc_id")
      .filter($"shard" =!= $"primary")
      .groupBy($"doc_id", $"primary")
      .agg(min(struct($"rpos", $"shard")).as("m"))
      .select($"doc_id", $"primary", $"m.shard".as("replica"))
    docs.join(repl, Seq("doc_id"))
  }

  /** The replica copy's store: [[ShardedIndex.buildStore]]'s layout
    * with the (node, origin) compound key — blocks partition each
    * origin shard's docs by their replica node. Input: (node, origin,
    * doc_id, text). */
  private def buildReplicaStore(assigned: DataFrame): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    assigned
      .select($"node", $"origin", $"doc_id",
        posexplode(split($"text", " ")))
      .select($"node", $"origin", $"doc_id", ($"pos" + 1).as("pos"),
        $"col".as("term"))
      .groupBy($"node", $"origin", $"term", $"doc_id")
      .agg(count(lit(1)).as("tf"), min($"pos").as("first_pos"))
      .groupBy($"node", $"origin", $"term",
        floor($"doc_id" / 100).as("bucket"))
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(Long, Long, String, Long, Seq[(Long, Long, Long)])]
      .map { case (node, origin, term, bucket, ps) =>
        (node, origin, term, bucket, ps.size, PostingCodec.encode(ps))
      }
      .toDF("node", "origin", "term", "bucket", "df", "bytes")
  }

  /** Ingest: place every doc (primary + replica), build BOTH copies'
    * stores and the serving sidecars. */
  def build(docs: DataFrame, nShards: Int): Replicated = {
    val s = docs.sparkSession
    import s.implicits._
    val positioned = docs.select($"doc_id", $"text",
      IndexReshard.position($"doc_id").as("p"))
    val a = assignPR(positioned, nShards)
    val assignments = a.select($"doc_id", $"primary", $"replica")
    val primaryStore = ShardedIndex.buildStore(
      a.select($"primary".as("shard"), $"doc_id", $"text"))
    val replicaStore = buildReplicaStore(
      a.select($"replica".as("node"), $"primary".as("origin"),
        $"doc_id", $"text"))
    val dl = docs.select($"doc_id",
      size(split($"text", " ")).cast(LongType).as("dl"))
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    Replicated(assignments, primaryStore, replicaStore, dl, stats)
  }

  /** Scatter-gather over ANY block selection that partitions the
    * corpus — (node, term, bucket, df, bytes) rows where `node` is the
    * serving node. df sums from the selection's metadata (exact
    * because the selection partitions docs), per-node local top-k via
    * the bounded TopKLong, k·|nodes|-row gather. Returns
    * (doc_id, score_ppm, node). */
  private def serveBlocks(sel: DataFrame, dl: DataFrame, stats: DataFrame,
      qTerms: Seq[String], k: Int): DataFrame = {
    val s = sel.sparkSession
    import s.implicits._
    val probed = sel.filter($"term".isin(qTerms: _*))
    val dfreq = probed.groupBy($"term")
      .agg(sum($"df").cast(LongType).as("df"))
    val decoded = probed
      .select($"node", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (node, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replicated serve: corrupt postings block $node/'$t'/$b"))
          .map { case (doc, tf, _) => (node, t, doc, tf) }
      }.toDF("node", "term", "doc_id", "tf")
    val scored = decoded
      .join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib_ppm", expr(ShardedIndex.bm25Ppm))
      .groupBy($"node", $"doc_id").agg(sum($"contrib_ppm").as("score_ppm"))
    val topK = udaf(new graft.functions.TopKLong(k))
    scored.groupBy($"node")
      .agg(topK($"score_ppm", $"doc_id", lit(0L)).as("tk"))
      .select($"node", explode($"tk").as("e"))
      .select($"node", $"e.id".as("doc_id"), $"e.score".as("score_ppm"))
      .orderBy($"score_ppm".desc, $"doc_id").limit(k)
      .select($"doc_id", $"score_ppm", $"node")
  }

  /** Normal serve: every shard answers from its PRIMARY copy. */
  def servePrimary(r: Replicated, qTerms: Seq[String], k: Int): DataFrame =
    serveBlocks(
      r.primaryStore.select(col("shard").as("node"), col("term"),
        col("bucket"), col("df"), col("bytes")),
      r.dl, r.stats, qTerms, k)

  /** Replica-routed serve: every doc answers from its REPLICA copy
    * (read load shed off the primaries — the other thing replicas are
    * for). Must equal [[servePrimary]]'s ranking exactly: the replica
    * store partitions the same corpus and scores use only global
    * stats. */
  def serveReplica(r: Replicated, qTerms: Seq[String], k: Int): DataFrame =
    serveBlocks(
      r.replicaStore.select(col("node"), col("term"), col("bucket"),
        col("df"), col("bytes")),
      r.dl, r.stats, qTerms, k)

  /** Node `failed` is down: its primaries serve from their replicas
    * (a key-space selection — origin = failed — on nodes that are all
    * ≠ failed by the placement law), everyone else serves primary.
    * Answer-invariant vs [[servePrimary]] for EVERY choice of failed
    * node (the spec pins all S). */
  def serveFailover(r: Replicated, failed: Long, qTerms: Seq[String],
      k: Int): DataFrame = {
    val prim = r.primaryStore.filter(col("shard") =!= failed)
      .select(col("shard").as("node"), col("term"), col("bucket"),
        col("df"), col("bytes"))
    val repl = r.replicaStore.filter(col("origin") === failed)
      .select(col("node"), col("term"), col("bucket"), col("df"),
        col("bytes"))
    serveBlocks(prim.unionByName(repl), r.dl, r.stats, qTerms, k)
  }
}
