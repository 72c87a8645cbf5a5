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

  /** `nShards` is the ring the assignments were built at — carried in
    * the store (the ReplicatedC device, r18) so [[update]]'s upsert
    * half places novel docs on the store's OWN ring and
    * [[grow]]/[[recoverLost]] fail loudly on a mismatched claim. */
  final case class Replicated(
      assignments: DataFrame,  // (doc_id, primary, replica), primary != replica
      primaryStore: DataFrame, // (shard, term, bucket, df, bytes)
      replicaStore: DataFrame, // (node, origin, term, bucket, df, bytes)
      dl: DataFrame,           // (doc_id, dl) — the doc-stats sidecar
      stats: DataFrame,        // (n_docs, adl) — global corpus stats
      nShards: Int)            // the ring size the placement used

  /** Dynamo preference list of length 2 on the md5 ring: input needs
    * (doc_id, p); output adds (primary, replica). The ring is DOUBLED
    * (each vnode again at pos + 2⁶⁰, one past the 15-hex position
    * domain) so the clockwise walk from any p is a plain ORDER BY over
    * rpos ≥ p — wrap-around included, no COALESCE branch.
    *
    * CONTRACT: `docs` carries each doc_id ONCE — a duplicated id would
    * mint duplicate assignment rows and non-strictly-ascending posting
    * lists, failing much later with an opaque encode/merge error. The
    * dedupe lives at the TOPOLOGY BOUNDARIES only ([[build]],
    * [[addReplicas]], ReplicatedCodes.build — the frames a caller
    * hands in), not here: recoverLost/grow/update call this on
    * by-construction-unique sidecars (dl, assignments), and q299
    * measured the per-call exchange+aggregate as the one
    * code-attributable regression of r17 (VERDICT r17 What's-wrong #1
    * — the guard was correct, the per-call cost avoidable).
    *
    * Scale (r18, closing the r16 scale note; REWRITTEN in the r18
    * optimization pass): the ring is MODEL-SIZED (2·S·16 vnodes), so
    * the ENTIRE preference-list function precomputes DRIVER-SIDE —
    * the vnode positions (the same md5 the SQL replays) sort once,
    * and the step function p → (primary, replica) materializes as a
    * 2·S·16-row (lo, hi, primary, replica) INTERVAL table: row i
    * covers p ∈ (rpos_{i-1}, rpos_i], its primary is vnode i's shard
    * and its replica the first later vnode with a different shard —
    * identical to "first (rpos, shard) ≥ p in sorted order" with the
    * wrap-around unrolled by the doubling. Placement is then ONE
    * broadcast non-equi join (lo < p AND p ≤ hi): intervals partition
    * the 60-bit position domain, so the join is 1:1 and row-preserving.
    * Zero exchanges, zero aggregations; the per-row cost is ≤ 2·S·16
    * codegen'd long comparisons against the broadcast table.
    *
    * WHY NOT a lambda projection (the first r18 attempt, reverted in
    * the optimization round): `filter(ringLiteral, x → x.rpos ≥ p)`
    * composed with a second filter referencing `primary` LOOKS like a
    * pure projection, but higher-order functions are CodegenFallback
    * (interpreted), and CollapseProject inlines both `p` (an md5
    * expression) and `primary` (the first 2·S·16-element filter) into
    * the replica lambda — interpreted eval then re-computes the md5
    * and the whole primary scan PER RING ELEMENT: ~(2·S·16)² ≈ 16k
    * md5 evaluations per row at S=4. Measured: single bench tasks sat
    * 10+ minutes in ArrayFilter/Md5 stacks at sf0.1 (jstack evidence
    * in OPTIMIZATION_r18.md). A join boundary materializes `p` once
    * per row by construction — the property the projection lacked. */
  private[graft] def assignPR(docs: DataFrame, shards: Int): DataFrame = {
    require(shards >= 2, s"replication needs >= 2 shards, got $shards")
    val s = docs.sparkSession
    import s.implicits._
    val ring = ringPositions(shards)
    val doubled =
      (ring ++ ring.map { case (p, sh) => (p + (1L << 60), sh) }).sorted
    // step-function intervals: entry i serves p in (rpos_{i-1}, rpos_i]
    // (ties on rpos leave the later entry's interval empty — the
    // (rpos, shard) sort order already picked the winner); replica_i =
    // first entry at index >= i whose shard differs from primary_i.
    // p is 15 hex digits, so p ≤ 2⁶⁰ − 1: intervals whose lo is at or
    // past that bound can never match and are dropped — which also
    // guarantees every KEPT interval's suffix still spans all shards
    // (a kept upper-half entry is the first one, so the whole mirrored
    // ring follows it), making the replica search total.
    val maxP = (1L << 60) - 1
    val intervals = doubled.zipWithIndex.flatMap { case ((hi, prim), i) =>
      val lo = if (i == 0) -1L else doubled(i - 1)._1
      if (lo >= maxP) None
      else {
        val repl = doubled.drop(i).collectFirst {
          case (_, sh) if sh != prim => sh
        }.getOrElse(sys.error(
          s"ring with $shards shards has no distinct replica after vnode $i"))
        Some((lo, hi, prim, repl))
      }
    }
    val iv = s.createDataFrame(intervals)
      .toDF("__lo", "__hi", "primary", "replica")
    docs.join(broadcast(iv), $"p" > $"__lo" && $"p" <= $"__hi")
      .drop("__lo", "__hi")
  }

  /** The ring's vnode positions computed DRIVER-SIDE — exactly
    * [[IndexReshard.ring]]'s values (md5("shard" ‖ sh ‖ ":" ‖ v), first
    * 15 hex digits as a Long), without a Spark job: the ring is
    * model-sized state, not data. Returns (pos, shard) pairs. */
  private def ringPositions(shards: Int): Seq[(Long, Long)] =
    (0 until shards).flatMap { sh =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 16).map { v =>
        val hex = md.digest(s"shard$sh:$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex.take(15), 16), sh.toLong)
      }
    }

  /** The replica copy's store: [[ShardedIndex.buildStore]]'s layout
    * with the (node, origin) compound key — blocks partition each
    * origin shard's docs by their replica node. Input: (node, origin,
    * doc_id, text). */
  private[graft] def buildReplicaStore(assigned: DataFrame): DataFrame = {
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
    * stores and the serving sidecars. Duplicate doc_ids drop
    * defensively at the boundary (ADVICE r16 — [[assignPR]]'s note);
    * exact duplicates are harmless, ids duplicated with DIFFERENT text
    * are the caller's bug and keep an arbitrary row. */
  def build(docs: DataFrame, nShards: Int): Replicated = {
    val s = docs.sparkSession
    import s.implicits._
    val positioned = docs.dropDuplicates("doc_id")
      .select($"doc_id", $"text",
        IndexReshard.position($"doc_id").as("p"))
    val a = assignPR(positioned, nShards)
    val assignments = a.select($"doc_id", $"primary", $"replica")
    val primaryStore = ShardedIndex.buildStore(
      a.select($"primary".as("shard"), $"doc_id", $"text"))
    val replicaStore = buildReplicaStore(
      a.select($"replica".as("node"), $"primary".as("origin"),
        $"doc_id", $"text"))
    val dl = positioned.select($"doc_id",
      size(split($"text", " ")).cast(LongType).as("dl"))
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    Replicated(assignments, primaryStore, replicaStore, dl, stats,
      nShards)
  }

  /** RAISE THE REPLICATION FACTOR 1 → 2 on an EXISTING single-copy
    * ring store (X119e, q315): the Elasticsearch
    * `number_of_replicas: 0 → 1` settings change — a tier that ran
    * single-copy (q288's shape) turns replication on WITHOUT re-reading
    * raw text. The existing store IS the primary copy already (its ring
    * assignment equals [[assignPR]]'s primary — the compat law
    * ReplicatedIndexSpec pins), so it passes through byte-UNTOUCHED;
    * the replica tier bootstraps FROM THE INDEX: every primary block
    * decodes once, postings re-key by their doc's preference-list
    * replica, and the (node, origin, term, bucket) blocks encode fresh.
    * Gap coding has no layout freedom ⇒ the bootstrapped pair ≡ a
    * from-scratch [[build]] at the same ring, BOTH stores BYTE FOR
    * BYTE — q315's oracle replays that build.
    *
    * Scale: decodes the FULL index exactly once and writes one new
    * copy — the inherent cost of raising the replication factor (ES
    * peer recovery streams every primary's segments the same way); the
    * re-key join is |postings|-sized on the compact doc_id key against
    * the broadcast-ring-assigned ID list; raw text never re-read. */
  def addReplicas(store: DataFrame, dl: DataFrame,
      nShards: Int): Replicated = {
    val s = store.sparkSession
    import s.implicits._
    // boundary dedupe (assignPR's pre-deduped contract): dl is
    // caller-supplied here, unlike the by-construction-unique sidecars
    // recoverLost/grow pass
    val ids = dl.select($"doc_id").dropDuplicates("doc_id")
      .withColumn("p", IndexReshard.position($"doc_id"))
    val a = assignPR(ids, nShards)
      .select($"doc_id", $"primary", $"replica")
    val replicaStore = store
      .select($"shard", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (sh, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"addReplicas: corrupt primary block $sh/'$t'/$b"))
          .map(p => (sh, t, b, p._1, p._2, p._3))
      }.toDF("origin", "term", "bucket", "doc_id", "tf", "first_pos")
      .join(a.select($"doc_id", $"replica".as("node")), "doc_id")
      .groupBy($"node", $"origin", $"term", $"bucket")
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(Long, Long, String, Long, Seq[(Long, Long, Long)])]
      .map { case (nd, og, t, b, ps) =>
        (nd, og, t, b, ps.size, PostingCodec.encode(ps))
      }.toDF("node", "origin", "term", "bucket", "df", "bytes")
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    Replicated(a, store, replicaStore, dl, stats, nShards)
  }

  /** LOWER THE REPLICATION FACTOR 2 → 1 (X119f, q329): the inverse of
    * [[addReplicas]] — the ES `number_of_replicas: 1 → 0` settings
    * change (a tier shedding storage cost, or staging data down before
    * a migration). The primary store IS the single-copy ring store
    * already (its assignment equals [[IndexReshard.assign]]'s — the
    * compat law the spec pins), so the verb is pure selection: the
    * primary copy and the dl sidecar pass through BYTE-UNTOUCHED and
    * the replica tier is simply dropped. Returns (store, dl) — q288's
    * single-copy shape, ready for [[IndexReshard]] maintenance or a
    * later [[addReplicas]] round trip (which the spec pins byte for
    * byte). Scale: zero data movement — the cheapest verb in the
    * matrix, listed for the completeness of the RF pair. */
  def dropReplicas(rep: Replicated): (DataFrame, DataFrame) =
    (rep.primaryStore, rep.dl)

  /** Scatter-gather over ANY block selection that partitions the
    * corpus — (node, term, bucket, df, bytes) rows where `node` is the
    * serving node. df sums from the selection's metadata (exact
    * because the selection partitions docs), per-node local top-k via
    * the bounded TopKLong, k·|nodes|-row gather. Returns
    * (doc_id, score_ppm, node). */
  private[graft] def serveBlocks(sel: DataFrame, dl: DataFrame,
      stats: DataFrame, qTerms: Seq[String], k: Int): DataFrame = {
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

  /** (k1, k2, term, bucket)-keyed decode-merge: `incoming` blocks of
    * raw postings (…, ps) fold into `existing` encoded blocks —
    * receiving blocks decode, interleave and re-encode (q264's merge),
    * non-receiving blocks pass through byte-UNTOUCHED. One helper for
    * both stores: the primary store normalizes to k2 = −1. */
  private def mergeBlocks(existing: DataFrame,
      incoming: DataFrame): DataFrame = {
    val s = existing.sparkSession
    import s.implicits._
    val keys = Seq("k1", "k2", "term", "bucket")
    val untouched = existing
      .join(incoming.select(keys.map(col): _*), keys, "left_anti")
    val merged = existing.join(incoming, keys, "full_outer")
      .filter($"ps".isNotNull)
      .select($"k1", $"k2", $"term", $"bucket", $"df", $"bytes", $"ps")
      .as[(Long, Long, String, Long, Option[Int], Option[Array[Byte]],
        Seq[(Long, Long, Long)])]
      .map { case (k1, k2, t, b, df, bytes, inc) =>
        val old = (df, bytes) match {
          case (Some(n), Some(bs)) =>
            PostingCodec.decode(bs, n)
              .getOrElse(throw new IllegalStateException(
                s"replica recovery: corrupt block $k1/$k2/'$t'/$b"))
          case _ => Seq.empty[(Long, Long, Long)]
        }
        val all = (old ++ inc).sortBy(_._1)
        require(all.map(_._1).distinct.size == all.size,
          s"replica recovery: overlapping doc ids in $k1/$k2/'$t'/$b")
        (k1, k2, t, b, all.size, PostingCodec.encode(all))
      }.toDF("k1", "k2", "term", "bucket", "df", "bytes")
    untouched.select($"k1", $"k2", $"term", $"bucket", $"df", $"bytes")
      .unionByName(merged)
  }

  /** q274's block-local takedown surgery generalized to any
    * (k1, k2, term, bucket, df, bytes)-keyed store: blocks of buckets
    * holding dead ids decode (strict), drop the dead postings and
    * re-encode; blocks whose bucket holds no dead id pass through
    * byte-UNTOUCHED (never decoded); emptied blocks vanish. `deadB` is
    * the (bucket, dead ids) grouping. */
  private[graft] def dropFromBlocks(store: DataFrame,
      deadB: DataFrame): DataFrame = {
    val s = store.sparkSession
    import s.implicits._
    store.join(deadB, Seq("bucket"), "left")
      .select($"k1", $"k2", $"term", $"bucket", $"df", $"bytes", $"dead")
      .as[(Long, Long, String, Long, Int, Array[Byte], Option[Seq[Long]])]
      .flatMap {
        case (k1, k2, t, b, n, bytes, None) =>
          // bucket untouched: bytes pass through, never re-coded
          Iterator.single((k1, k2, t, b, n, bytes))
        case (k1, k2, t, b, n, bytes, Some(dd)) =>
          val ps = PostingCodec.decode(bytes, n)
            .getOrElse(throw new IllegalStateException(
              s"replicated takedown: corrupt block $k1/$k2/'$t'/$b"))
          val gone = dd.toSet
          val kept = ps.filterNot(p => gone.contains(p._1))
          if (kept.isEmpty) Iterator.empty
          else Iterator.single(
            (k1, k2, t, b, kept.size, PostingCodec.encode(kept)))
      }
      .toDF("k1", "k2", "term", "bucket", "df", "bytes")
  }

  /** TAKEDOWN on the replicated topology (X119d, q304): the
    * right-to-be-forgotten event against a TWO-COPY store — q274
    * deletes from the single-copy postings store, but a replicated
    * tier must run the same block surgery on BOTH copies or the dead
    * doc keeps serving the moment any node fails over (the
    * compliance hole: ES deletes propagate primary → replica before
    * acking). One law, both stores: buckets holding dead ids decode,
    * drop and re-encode; every other block passes byte-UNTOUCHED;
    * emptied blocks vanish; the dl/assignment sidecars and global
    * stats shrink to the survivors. Gap coding has no layout freedom
    * ⇒ maintained ≡ a from-scratch [[build]] over the surviving
    * corpus, BOTH stores BYTE FOR BYTE — q304's oracle replays
    * exactly that build (the surgery never enters it).
    *
    * Scale: q274's posture twice — the dead set groups to
    * bucket-count-bounded (bucket → ids) arrays; each store pays one
    * equi-join on the compact bucket key (no forced broadcast — AQE
    * decides at takedown scale); re-encode cost is |touched blocks| ×
    * block width per copy, never corpus-shaped. */
  def takedown(rep: Replicated, deadIds: DataFrame): Replicated = {
    val s = rep.primaryStore.sparkSession
    import s.implicits._
    val dead = deadIds
      .select(col(deadIds.columns.head).cast("long").as("doc_id"))
      .distinct()
    val deadB = dead
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    val newPrimary = dropFromBlocks(
      rep.primaryStore.select($"shard".as("k1"), lit(-1L).as("k2"),
        $"term", $"bucket", $"df", $"bytes"), deadB)
      .select($"k1".as("shard"), $"term", $"bucket", $"df", $"bytes")
    val newReplica = dropFromBlocks(
      rep.replicaStore.select($"node".as("k1"), $"origin".as("k2"),
        $"term", $"bucket", $"df", $"bytes"), deadB)
      .select($"k1".as("node"), $"k2".as("origin"), $"term", $"bucket",
        $"df", $"bytes")
    val dl = rep.dl.join(dead, Seq("doc_id"), "left_anti")
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    Replicated(
      rep.assignments.join(dead, Seq("doc_id"), "left_anti"),
      newPrimary, newReplica, dl, stats, rep.nShards)
  }

  /** Document UPDATE / re-index on the REPLICATED topology (X109q,
    * q319): the r17 verdict's "missing #1" and the LAST open cell of
    * the write-verb matrix — q305's re-index verb (Elasticsearch's
    * `index` over an existing id, the commonest write after append) ran
    * on the single-copy q258 store, while the replicated topology had
    * append (T39), takedown (q304) and the lifecycle verbs but not the
    * verb a production tier runs most. Like a delete, an update must
    * reach BOTH copies before acking (ES propagates the `index` verb
    * primary → replica) or a failover serves the STALE version — the
    * same compliance hole q304 closed for deletes, this time serving
    * outdated text rather than reaped text. One law, both stores:
    *
    *   - the updated ids run q304's two-copy block surgery
    *     ([[dropFromBlocks]]) — old versions drop from exactly the
    *     touched buckets of BOTH stores;
    *   - the NEW text builds per-copy delta blocks keyed by each doc's
    *     assignment — EXISTING docs keep their placement (the ring is a
    *     pure function of doc_id, so an update never moves a document:
    *     the verb is block surgery, not a re-shard), novel ids place
    *     fresh at the store's OWN carried ring (the upsert half);
    *   - [[mergeBlocks]] folds each delta in per store — ids are
    *     disjoint again after the surgery, so q264's overlap law holds
    *     by construction; non-receiving blocks pass byte-UNTOUCHED;
    *   - the dl sidecar swaps old rows for new, global stats recompute
    *     (an edit changes dl, hence adl, hence every BM25 score — the
    *     stats sidecar is why the verb must own the dl swap).
    *
    * Gap coding has no layout freedom ⇒ updated ≡ a from-scratch
    * [[build]] over the POST-UPDATE corpus, BOTH stores BYTE FOR BYTE —
    * q319's oracle replays exactly that build (the verb never enters
    * it), hash-matched at all 3 SFs. ReplicatedIndexSpec pins upsert,
    * idempotence, untouched-block passthrough on both stores, and
    * placement-never-moves; T44 fires the verb MID-STREAM against the
    * two-copy T39 state (tombstones-forever still beat it).
    *
    * Scale: q305's posture twice — updated ids group to bucket-bounded
    * arrays, one compact-key equi-join per copy for the surgery, the
    * delta is |updated docs|-sized and its merge decodes only receiving
    * blocks; the ring join runs over the UPDATED id list only; raw
    * unchanged text never re-read; never corpus-shaped. */
  def update(rep: Replicated, updated: DataFrame): Replicated = {
    val s = rep.primaryStore.sparkSession
    import s.implicits._
    val up = updated
      .select(col(updated.columns.head).cast("long").as("doc_id"),
        col(updated.columns(1)).as("text"))
      .dropDuplicates("doc_id")
    val ids = up.select($"doc_id")
    // ---- surgery: both copies drop the updated ids' OLD postings
    val deadB = ids
      .groupBy(expr("doc_id DIV 100").as("bucket"))
      .agg(sort_array(collect_list($"doc_id")).as("dead"))
    val cutP = dropFromBlocks(
      rep.primaryStore.select($"shard".as("k1"), lit(-1L).as("k2"),
        $"term", $"bucket", $"df", $"bytes"), deadB)
    val cutR = dropFromBlocks(
      rep.replicaStore.select($"node".as("k1"), $"origin".as("k2"),
        $"term", $"bucket", $"df", $"bytes"), deadB)
    // ---- placement: existing docs KEEP theirs; novel ids place fresh
    // on the store's carried ring (the upsert half)
    val novel = up.join(rep.assignments, Seq("doc_id"), "left_anti")
    val novelA = assignPR(
      novel.select($"doc_id", IndexReshard.position($"doc_id").as("p")),
      rep.nShards)
      .select($"doc_id", $"primary", $"replica")
    val aUp = rep.assignments.join(ids, "doc_id")
      .select($"doc_id", $"primary", $"replica")
      .unionByName(novelA)
    // ---- delta blocks for both stores from the NEW text
    val d = up.join(aUp, "doc_id")
      .select($"primary", $"replica", $"doc_id",
        posexplode(split($"text", " ")))
      .select($"primary", $"replica", $"doc_id", ($"pos" + 1).as("pos"),
        $"col".as("term"))
      .groupBy($"primary", $"replica", $"term", $"doc_id")
      .agg(count(lit(1)).as("tf"), min($"pos").as("first_pos"))
    val deltaP = d
      .groupBy($"primary".as("k1"), lit(-1L).as("k2"), $"term",
        floor($"doc_id" / 100).as("bucket"))
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
    val deltaR = d
      .groupBy($"replica".as("k1"), $"primary".as("k2"), $"term",
        floor($"doc_id" / 100).as("bucket"))
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
    val newPrimary = mergeBlocks(cutP, deltaP)
      .select($"k1".as("shard"), $"term", $"bucket", $"df", $"bytes")
    val newReplica = mergeBlocks(cutR, deltaR)
      .select($"k1".as("node"), $"k2".as("origin"), $"term", $"bucket",
        $"df", $"bytes")
    // ---- sidecars: dl swaps old for new; stats follow the swap
    val dl = rep.dl.join(ids, Seq("doc_id"), "left_anti")
      .unionByName(up.select($"doc_id",
        size(split($"text", " ")).cast(LongType).as("dl")))
    val stats = dl
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum($"dl").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    Replicated(rep.assignments.unionByName(novelA), newPrimary,
      newReplica, dl, stats, rep.nShards)
  }

  /** PERMANENT loss of the highest node (X119b, q299): [[serveFailover]]
    * keeps answering the moment a node dies, but a tier running on one
    * copy of the dead node's docs is one more failure from data loss —
    * production systems RE-REPLICATE (Elasticsearch re-allocates lost
    * shard copies from survivors; Dynamo anti-entropy). This rebuilds a
    * fully-replicated S−1-node topology FROM THE SURVIVING COPIES ONLY
    * — raw text never re-read, the lost node's blocks never touched:
    *
    *   - PROMOTION: a doc whose primary died has, as its new S−1-ring
    *     owner, exactly its OLD REPLICA node (the first surviving vnode
    *     clockwise IS the first distinct-shard vnode when the primary's
    *     vnodes all vanish — the Dynamo argument), so its replica
    *     blocks (node r, origin = lost) re-key to primary blocks of
    *     shard r wholesale, merging into r's existing primaries;
    *   - RE-REPLICATION: those promoted docs get fresh replicas at the
    *     S−1 ring, and docs whose REPLICA died re-extract from their
    *     (intact) primary blocks — both regroup into the replica store,
    *     merging where keys collide;
    *   - every other block — primaries of survivors, replica blocks
    *     with node ≠ lost and origin ≠ lost — passes through
    *     byte-UNTOUCHED (placement is provably unchanged: a lost vnode
    *     ahead of a doc's surviving primary/replica vnode would have
    *     BEEN that doc's primary/replica).
    *
    * Gap coding has no layout freedom ⇒ recovered ≡ a from-scratch
    * [[build]] at S−1 shards, BOTH stores BYTE FOR BYTE — q299's
    * oracle replays exactly that build (primary AND replica streams;
    * the recovery never enters it); ReplicatedIndexSpec pins the
    * promotion law (new primary == old replica for every lost-primary
    * doc), the byte law, and serve-invariance across the loss.
    *
    * Scale: the decode set is the lost node's hosted docs' blocks
    * (~2/S of the index: its primaries' replica copies + its replicas'
    * primary buckets), the re-key joins are |lost-hosted postings|-
    * sized on compact keys, and the ring assignment is the broadcast
    * doubled-ring device over the ID list. */
  def recoverLost(rep: Replicated, oldShards: Int): Replicated = {
    require(oldShards == rep.nShards,
      s"recoverLost at $oldShards on a ${rep.nShards}-ring store")
    require(oldShards >= 3,
      s"recovery needs >= 3 shards (>= 2 survive), got $oldShards")
    val lost = (oldShards - 1).toLong
    val s = rep.primaryStore.sparkSession
    import s.implicits._
    val ids = rep.dl.select($"doc_id")
      .withColumn("p", IndexReshard.position($"doc_id"))
    val a2 = assignPR(ids, oldShards - 1)
      .select($"doc_id", $"primary", $"replica")
    // ---- surviving, placement-unchanged blocks (never decoded)
    val sp = rep.primaryStore.filter($"shard" =!= lost)
    val keepRepl = rep.replicaStore
      .filter($"node" =!= lost && $"origin" =!= lost)
    // ---- decode the two surviving sources of lost-hosted data
    // (a) the dead node's primaries live on as replica copies
    val aPost = rep.replicaStore.filter($"origin" === lost)
      .select($"node", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (node, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replica recovery: corrupt replica block $node/'$t'/$b"))
          .map(p => (node, t, b, p._1, p._2, p._3))
      }.toDF("node", "term", "bucket", "doc_id", "tf", "first_pos")
    // (b) docs whose REPLICA died: extract from their primary buckets
    val bDocs = rep.assignments
      .filter($"replica" === lost && $"primary" =!= lost)
      .select($"doc_id", $"primary")
    val bKeys = bDocs
      .select($"primary".as("shard"), expr("doc_id DIV 100").as("bucket"))
      .distinct()
    val bPost = sp.join(bKeys, Seq("shard", "bucket"))
      .select($"shard", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (sh, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replica recovery: corrupt primary block $sh/'$t'/$b"))
          .map(p => (t, b, p._1, p._2, p._3))
      }.toDF("term", "bucket", "doc_id", "tf", "first_pos")
      .join(bDocs.select($"doc_id"), "doc_id")
    // ---- promotion: (node r, origin = lost) blocks become shard-r
    // primaries (every member's S−1 owner IS r — the Dynamo argument)
    val promoted = aPost
      .groupBy($"node".as("k1"), lit(-1L).as("k2"), $"term", $"bucket")
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
    val newPrimary = mergeBlocks(
      sp.select($"shard".as("k1"), lit(-1L).as("k2"), $"term", $"bucket",
        $"df", $"bytes"),
      promoted)
      .select($"k1".as("shard"), $"term", $"bucket", $"df", $"bytes")
    // ---- re-replication: fresh S−1-ring replicas for every doc the
    // lost node hosted (either copy), placed by the NEW assignment
    val reRepl = aPost
      .select($"term", $"bucket", $"doc_id", $"tf", $"first_pos")
      .unionByName(bPost)
      .join(a2, "doc_id")
      .groupBy($"replica".as("k1"), $"primary".as("k2"), $"term",
        $"bucket")
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
    val newReplica = mergeBlocks(
      keepRepl.select($"node".as("k1"), $"origin".as("k2"), $"term",
        $"bucket", $"df", $"bytes"),
      reRepl)
      .select($"k1".as("node"), $"k2".as("origin"), $"term", $"bucket",
        $"df", $"bytes")
    Replicated(a2, newPrimary, newReplica, rep.dl, rep.stats,
      oldShards - 1)
  }

  /** GROW a replicated topology from S to S+1 nodes, INDEX-ONLY
    * (X119c, q302): q288's elastic grow composed with q294's
    * replication — when a node joins a replicated tier BOTH copies'
    * placements can move, and the consistent-hash walk makes every
    * move enumerable:
    *
    *   - PRIMARY moved (class A): the new shard's vnode is now first,
    *     so the new primary is ALWAYS shard S — and the new REPLICA is
    *     the doc's OLD PRIMARY (the first distinct-from-S vnode is the
    *     old first vnode). The old primary copy changes ROLES in place
    *     (same node, primary block → replica block keyed (op, S)), and
    *     the new primary copy on S extracts from it.
    *   - REPLICA moved, primary unchanged (class B): the new replica
    *     is always shard S; the copy moves from its old node to S.
    *   - Everything else is untouched — a new vnode ahead of an
    *     unchanged placement would have captured it (the q288
    *     argument, run per copy).
    *
    * All mover postings extract from TOUCHED OLD-PRIMARY blocks
    * (strict decode); class-A docs drop from their old primary blocks
    * and all movers drop from their old replica blocks (q274's
    * surgery, emptied blocks vanish); the additions regroup at the new
    * keys — which all involve shard S in one component, so they never
    * collide with surviving blocks and no merge pass is needed. Gap
    * coding has no layout freedom ⇒ grown ≡ a from-scratch [[build]]
    * at S+1, BOTH stores BYTE FOR BYTE (q302's oracle replays that
    * build; ReplicatedIndexSpec also pins grow∘recoverLost as a
    * round-trip back to the S-ring build).
    *
    * Scale: q288's posture per copy — the decode set is the movers'
    * touched blocks (~2/(S+1) of the index across both stores), re-key
    * joins are mover-sized on compact keys, assignment is the
    * broadcast doubled-ring device over the ID list; raw text never
    * re-read (the property T40 needs to fire this mid-stream). */
  def grow(rep: Replicated, oldShards: Int): Replicated = {
    require(oldShards == rep.nShards,
      s"grow at $oldShards on a ${rep.nShards}-ring store")
    require(oldShards >= 2, s"grow needs >= 2 shards, got $oldShards")
    val s = rep.primaryStore.sparkSession
    import s.implicits._
    val newShard = oldShards.toLong
    val ids = rep.dl.select($"doc_id")
      .withColumn("p", IndexReshard.position($"doc_id"))
    val a2 = assignPR(ids, oldShards + 1)
      .select($"doc_id", $"primary", $"replica")
    val ch = rep.assignments
      .select($"doc_id", $"primary".as("op"), $"replica".as("or"))
      .join(a2, "doc_id")
    val movers = ch.filter($"primary" =!= $"op" || $"replica" =!= $"or")
    // ---- extract every mover's postings from its old primary blocks
    val tKeys = movers
      .select($"op".as("shard"), expr("doc_id DIV 100").as("bucket"))
      .distinct()
    val mPost = rep.primaryStore.join(tKeys, Seq("shard", "bucket"))
      .select($"shard", $"term", $"bucket", $"df", $"bytes")
      .as[(Long, String, Long, Int, Array[Byte])]
      .flatMap { case (sh, t, b, n, bytes) =>
        PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replicated grow: corrupt primary block $sh/'$t'/$b"))
          .map(p => (t, b, p._1, p._2, p._3))
      }.toDF("term", "bucket", "doc_id", "tf", "first_pos")
      .join(movers, "doc_id")
    // ---- primary store: class-A docs leave their old blocks…
    val deadP = movers.filter($"primary" === newShard)
      .groupBy($"op".as("shard"), expr("doc_id DIV 100").as("bucket"))
      .agg(collect_set($"doc_id").as("dead"))
    val untouchedP = rep.primaryStore
      .join(deadP.select($"shard", $"bucket"), Seq("shard", "bucket"),
        "left_anti")
    val keptP = rep.primaryStore.join(deadP, Seq("shard", "bucket"))
      .select($"shard", $"term", $"bucket", $"df", $"bytes", $"dead")
      .as[(Long, String, Long, Int, Array[Byte], Seq[Long])]
      .flatMap { case (sh, t, b, n, bytes, dd) =>
        val ps = PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replicated grow: corrupt primary block $sh/'$t'/$b"))
        val gone = dd.toSet
        val k = ps.filterNot(p => gone.contains(p._1))
        if (k.isEmpty) Iterator.empty
        else Iterator.single((sh, t, b, k.size, PostingCodec.encode(k)))
      }.toDF("shard", "term", "bucket", "df", "bytes")
    // …and regroup on the new shard (keys disjoint from survivors)
    val addP = mPost.filter($"primary" === newShard)
      .groupBy($"term", $"bucket")
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(String, Long, Seq[(Long, Long, Long)])]
      .map { case (t, b, ps) =>
        (newShard, t, b, ps.size, PostingCodec.encode(ps))
      }.toDF("shard", "term", "bucket", "df", "bytes")
    val newPrimary = untouchedP
      .select($"shard", $"term", $"bucket", $"df", $"bytes")
      .unionByName(keptP).unionByName(addP)
    // ---- replica store: every mover leaves its old replica block…
    val deadR = movers
      .groupBy($"or".as("node"), $"op".as("origin"),
        expr("doc_id DIV 100").as("bucket"))
      .agg(collect_set($"doc_id").as("dead"))
    val untouchedR = rep.replicaStore
      .join(deadR.select($"node", $"origin", $"bucket"),
        Seq("node", "origin", "bucket"), "left_anti")
    val keptR = rep.replicaStore.join(deadR, Seq("node", "origin", "bucket"))
      .select($"node", $"origin", $"term", $"bucket", $"df", $"bytes",
        $"dead")
      .as[(Long, Long, String, Long, Int, Array[Byte], Seq[Long])]
      .flatMap { case (nd, og, t, b, n, bytes, dd) =>
        val ps = PostingCodec.decode(bytes, n)
          .getOrElse(throw new IllegalStateException(
            s"replicated grow: corrupt replica block $nd/$og/'$t'/$b"))
        val gone = dd.toSet
        val k = ps.filterNot(p => gone.contains(p._1))
        if (k.isEmpty) Iterator.empty
        else Iterator.single((nd, og, t, b, k.size, PostingCodec.encode(k)))
      }.toDF("node", "origin", "term", "bucket", "df", "bytes")
    // …and regroups at its new placement — class A at (old primary, S),
    // class B at (S, primary): both keys carry S, so no survivor merge
    val addR = mPost
      .groupBy($"replica".as("node"), $"primary".as("origin"), $"term",
        $"bucket")
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(Long, Long, String, Long, Seq[(Long, Long, Long)])]
      .map { case (nd, og, t, b, ps) =>
        (nd, og, t, b, ps.size, PostingCodec.encode(ps))
      }.toDF("node", "origin", "term", "bucket", "df", "bytes")
    val newReplica = untouchedR
      .select($"node", $"origin", $"term", $"bucket", $"df", $"bytes")
      .unionByName(keptR).unionByName(addR)
    Replicated(a2, newPrimary, newReplica, rep.dl, rep.stats,
      oldShards + 1)
  }

  /** The ROUTED block selection with node `failed` down: primaries of
    * every node ≠ failed ∪ replica blocks with origin = failed (all on
    * nodes ≠ failed by the placement law). PARTITIONS the corpus, so
    * any read composed over it — ranking, facets, pagination — is
    * answer-invariant vs the single-copy store. Returns (node, term,
    * bucket, df, bytes). */
  def failoverSelection(r: Replicated, failed: Long): DataFrame = {
    val prim = r.primaryStore.filter(col("shard") =!= failed)
      .select(col("shard").as("node"), col("term"), col("bucket"),
        col("df"), col("bytes"))
    val repl = r.replicaStore.filter(col("origin") === failed)
      .select(col("node"), col("term"), col("bucket"), col("df"),
        col("bytes"))
    prim.unionByName(repl)
  }

  /** Node `failed` is down: its primaries serve from their replicas
    * (a key-space selection — origin = failed — on nodes that are all
    * ≠ failed by the placement law), everyone else serves primary.
    * Answer-invariant vs [[servePrimary]] for EVERY choice of failed
    * node (the spec pins all S). */
  def serveFailover(r: Replicated, failed: Long, qTerms: Seq[String],
      k: Int): DataFrame =
    serveBlocks(failoverSelection(r, failed), r.dl, r.stats, qTerms, k)
}
