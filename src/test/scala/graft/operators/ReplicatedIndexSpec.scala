package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X119 pins for [[ReplicatedIndex]] (q294):
  *  - placement laws: primary equals the reshard ring's assignment
  *    (replication composes with grow/shrink), and primary ≠ replica
  *    for EVERY doc (the property failover rests on);
  *  - the replica-copy byte law: decode-union-encode of one origin
  *    shard's replica blocks across nodes equals that origin's primary
  *    block byte for byte (canonical gap coding — the replica is a
  *    reconstructible copy, not just a score-equivalent one);
  *  - failover invariance for EVERY choice of failed node: same rows,
  *    same scores as the primary serve;
  *  - replica-routed serve ≡ primary serve (read shedding);
  *  - failover routing: with node x down, no answer is served BY x,
  *    and x's primaries are answered by their replica nodes.
  */
class ReplicatedIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = (0L until 300L).map { i =>
    val body = Seq.fill(3 + (i % 7).toInt)(s"w${i % 19}") ++
      (if (i % 3 == 0) Seq("alpha", "beta") else Seq(s"t${i % 5}"))
    (i, body.mkString(" "))
  }
  private def docs = corpus.toDF("doc_id", "text")
  private val qTerms = Seq("alpha", "w3", "t2")

  test("placement: primary == the reshard ring's assignment and " +
    "primary != replica for every doc") {
    val rep = ReplicatedIndex.build(docs, 4)
    val a = rep.assignments
    assert(a.count() === corpus.size.toLong)
    assert(a.filter($"primary" === $"replica").count() === 0L,
      "a doc's two copies landed on one node")
    val ringAssign = IndexReshard.assign(
      docs.select($"doc_id")
        .withColumn("p", IndexReshard.position($"doc_id")), 4, "shard")
      .select($"doc_id", $"shard")
    assert(a.join(ringAssign, "doc_id")
      .filter($"primary" =!= $"shard").count() === 0L,
      "primary diverged from IndexReshard.assign — grow/shrink compat broken")
  }

  test("replica copy byte law: an origin's replica blocks, decoded, " +
    "unioned and re-encoded, equal its primary block byte for byte") {
    val rep = ReplicatedIndex.build(docs, 4)
    val prim = rep.primaryStore.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getInt(3), r.getAs[Array[Byte]](4).toSeq)
    }.toMap
    val regrouped = rep.replicaStore.collect().flatMap { r =>
      val key = (r.getLong(1), r.getString(2), r.getLong(3)) // (origin,…)
      PostingCodec.decode(r.getAs[Array[Byte]](5), r.getInt(4))
        .getOrElse(fail(s"corrupt replica block $key"))
        .map(p => key -> p)
    }.groupBy(_._1).map { case (k, ps) =>
      val sorted = ps.map(_._2).sortBy(_._1).toSeq
      k -> (sorted.size, PostingCodec.encode(sorted).toSeq)
    }
    assert(regrouped == prim, "replica copy is not byte-reconstructible")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("doc_id", "score_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("failover invariance: dropping ANY one node changes no answer") {
    val rep = ReplicatedIndex.build(docs, 4)
    val base = rows(ReplicatedIndex.servePrimary(rep, qTerms, 15))
    assert(base.nonEmpty, "empty baseline serve")
    for (x <- 0L until 4L)
      assert(rows(ReplicatedIndex.serveFailover(rep, x, qTerms, 15)) == base,
        s"failover of node $x changed the ranking")
  }

  test("replica-routed serve == primary serve (read shedding)") {
    val rep = ReplicatedIndex.build(docs, 4)
    assert(rows(ReplicatedIndex.serveReplica(rep, qTerms, 15)) ==
      rows(ReplicatedIndex.servePrimary(rep, qTerms, 15)))
  }

  test("loss recovery: recovered == from-scratch 3-shard replicated " +
    "build, BOTH stores byte for byte, assignments included") {
    val rep = ReplicatedIndex.build(docs, 4)
    val rec = ReplicatedIndex.recoverLost(rep, 4)
    val want = ReplicatedIndex.build(docs, 3)
    def pMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(0), r.getString(1), r.getLong(2)) ->
          (r.getInt(3), r.getAs[Array[Byte]](4).toSeq)
      }.toMap
    def rMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)) ->
          (r.getInt(4), r.getAs[Array[Byte]](5).toSeq)
      }.toMap
    assert(pMap(rec.primaryStore) == pMap(want.primaryStore),
      "recovered primary store != from-scratch build")
    assert(rMap(rec.replicaStore) == rMap(want.replicaStore),
      "recovered replica store != from-scratch build")
    def aMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aMap(rec.assignments) == aMap(want.assignments))
  }

  test("promotion law: every lost-primary doc's new primary IS its old " +
    "replica; every other doc's placement is untouched") {
    val rep = ReplicatedIndex.build(docs, 4)
    val rec = ReplicatedIndex.recoverLost(rep, 4)
    val joined = rep.assignments
      .select($"doc_id", $"primary".as("op"), $"replica".as("or"))
      .join(rec.assignments, "doc_id").collect()
    assert(joined.nonEmpty)
    var lostSeen = 0
    joined.foreach { r =>
      val (op, or, np, nr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (op == 3L) { lostSeen += 1; assert(np === or, s"doc ${r.getLong(0)}") }
      else {
        assert(np === op, s"doc ${r.getLong(0)}: healthy primary moved")
        if (or != 3L) assert(nr === or,
          s"doc ${r.getLong(0)}: untouched replica moved")
      }
    }
    assert(lostSeen > 0, "corpus missed the lost shard — weak fixture")
  }

  test("serve-invariance across the loss: recovered topology answers " +
    "identically to the pre-loss one") {
    val rep = ReplicatedIndex.build(docs, 4)
    val rec = ReplicatedIndex.recoverLost(rep, 4)
    assert(rows(ReplicatedIndex.servePrimary(rec, qTerms, 15)) ==
      rows(ReplicatedIndex.servePrimary(rep, qTerms, 15)))
  }

  private def pMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getInt(3), r.getAs[Array[Byte]](4).toSeq)
    }.toMap
  private def rMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)) ->
        (r.getInt(4), r.getAs[Array[Byte]](5).toSeq)
    }.toMap

  test("replicated grow: grown == from-scratch S+1 replicated build, " +
    "BOTH stores byte for byte, at two ring sizes") {
    for (s0 <- Seq(2, 3)) {
      val rep = ReplicatedIndex.build(docs, s0)
      val grown = ReplicatedIndex.grow(rep, s0)
      val want = ReplicatedIndex.build(docs, s0 + 1)
      assert(pMap(grown.primaryStore) == pMap(want.primaryStore),
        s"grow $s0 -> ${s0 + 1}: primary store diverged")
      assert(rMap(grown.replicaStore) == rMap(want.replicaStore),
        s"grow $s0 -> ${s0 + 1}: replica store diverged")
    }
  }

  test("grow class laws: a moved primary lands on the NEW shard with " +
    "its old primary as replica; a moved replica lands on the new shard") {
    val rep = ReplicatedIndex.build(docs, 3)
    val grown = ReplicatedIndex.grow(rep, 3)
    val joined = rep.assignments
      .select($"doc_id", $"primary".as("op"), $"replica".as("or"))
      .join(grown.assignments, "doc_id").collect()
    var (nA, nB) = (0, 0)
    joined.foreach { r =>
      val (op, or, np, nr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (np != op) {
        nA += 1
        assert(np === 3L, s"doc ${r.getLong(0)}: moved primary not on S")
        assert(nr === op, s"doc ${r.getLong(0)}: class-A replica != old primary")
      } else if (nr != or) {
        nB += 1
        assert(nr === 3L, s"doc ${r.getLong(0)}: moved replica not on S")
      }
    }
    assert(nA > 0 && nB > 0, s"weak fixture: classes A=$nA B=$nB")
  }

  test("grow then recoverLost round-trips to the S-ring replicated build") {
    val rep = ReplicatedIndex.build(docs, 3)
    val back = ReplicatedIndex.recoverLost(ReplicatedIndex.grow(rep, 3), 4)
    assert(pMap(back.primaryStore) == pMap(rep.primaryStore))
    assert(rMap(back.replicaStore) == rMap(rep.replicaStore))
  }

  test("failover routing: nothing serves FROM the dead node; its " +
    "primaries answer from their replica nodes") {
    val rep = ReplicatedIndex.build(docs, 4)
    val failed = 2L
    val served = ReplicatedIndex.serveFailover(rep, failed, qTerms, 15)
      .join(rep.assignments, "doc_id")
      .select($"doc_id", $"node", $"primary", $"replica").collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val (node, prim, repl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(node !== failed, s"doc ${r.getLong(0)} served by the dead node")
      if (prim == failed)
        assert(node === repl, s"doc ${r.getLong(0)}: failed primary not " +
          "served by its replica")
      else
        assert(node === prim, s"doc ${r.getLong(0)}: healthy primary not " +
          "used")
    }
  }

  // ---- X119d (q304): takedown on BOTH copies ----

  private def pBytes(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getInt(3), r.getAs[Array[Byte]](4).toSeq)
    }.toMap
  private def rBytes(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)) ->
        (r.getInt(4), r.getAs[Array[Byte]](5).toSeq)
    }.toMap

  test("takedown: maintained == from-scratch build over survivors, " +
    "BOTH stores byte for byte, sidecars shrunk") {
    val rep = ReplicatedIndex.build(docs, 4)
    val dead = corpus.map(_._1).filter(_ % 4 == 1)
    val got = ReplicatedIndex.takedown(rep, dead.toDF("doc_id"))
    val want = ReplicatedIndex.build(
      corpus.filterNot(d => d._1 % 4 == 1).toDF("doc_id", "text"), 4)
    assert(pBytes(got.primaryStore) == pBytes(want.primaryStore),
      "takedown primary store != rebuild over survivors")
    assert(rBytes(got.replicaStore) == rBytes(want.replicaStore),
      "takedown replica store != rebuild over survivors")
    assert(got.dl.count() === want.dl.count())
    assert(got.assignments.filter($"doc_id" % 4 === 1).count() === 0L)
    // unknown ids are no-ops
    val noop = ReplicatedIndex.takedown(rep, Seq(99999L).toDF("doc_id"))
    assert(pBytes(noop.primaryStore) == pBytes(rep.primaryStore))
    assert(rBytes(noop.replicaStore) == rBytes(rep.replicaStore))
  }

  test("takedown consequence: EVERY failover selection ranks without " +
    "the dead docs — the two-copy surgery closes the compliance hole") {
    val rep = ReplicatedIndex.build(docs, 4)
    val dead = corpus.map(_._1).filter(_ % 4 == 1)
    val got = ReplicatedIndex.takedown(rep, dead.toDF("doc_id"))
    val want = rows(ReplicatedIndex.servePrimary(
      ReplicatedIndex.build(
        corpus.filterNot(d => d._1 % 4 == 1).toDF("doc_id", "text"), 4),
      qTerms, 15))
    assert(want.nonEmpty)
    assert(rows(ReplicatedIndex.servePrimary(got, qTerms, 15)) == want)
    for (x <- 0L until 4L)
      assert(rows(ReplicatedIndex.serveFailover(got, x, qTerms, 15))
        == want, s"failover of node $x after takedown still serves dead docs")
  }

  test("update (q319): maintained == from-scratch build over the " +
    "post-update corpus, BOTH stores byte for byte, dl/stats swapped, " +
    "and an update never moves a document") {
    val rep = ReplicatedIndex.build(docs, 4)
    val upd = corpus.filter(_._1 % 5 == 2)
      .map { case (i, t) => (i, s"edit $t") }
    val got = ReplicatedIndex.update(rep, upd.toDF("doc_id", "text"))
    val post = corpus.map { case (i, t) =>
      (i, if (i % 5 == 2) s"edit $t" else t) }
    val want = ReplicatedIndex.build(post.toDF("doc_id", "text"), 4)
    assert(pBytes(got.primaryStore) == pBytes(want.primaryStore),
      "updated primary store != rebuild over post-update corpus")
    assert(rBytes(got.replicaStore) == rBytes(want.replicaStore),
      "updated replica store != rebuild over post-update corpus")
    // placement never moves: assignments unchanged row for row
    val before = rep.assignments.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val after = got.assignments.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after == before, "an update moved a document's placement")
    // the dl sidecar swapped old rows for new (edit adds one token)
    val dlAfter = got.dl.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dlWant = want.dl.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dlAfter == dlWant, "dl sidecar not swapped")
  }

  test("update upsert half: a novel id inserts at the carried ring; " +
    "idempotence: updating to identical text changes no block") {
    val rep = ReplicatedIndex.build(docs, 4)
    // upsert: an id the store has never seen
    val novel = Seq((9999L, "alpha beta w3 fresh"))
    val got = ReplicatedIndex.update(rep, novel.toDF("doc_id", "text"))
    val want = ReplicatedIndex.build(
      (corpus ++ novel).toDF("doc_id", "text"), 4)
    assert(pBytes(got.primaryStore) == pBytes(want.primaryStore),
      "upsert primary store != rebuild with the novel doc")
    assert(rBytes(got.replicaStore) == rBytes(want.replicaStore),
      "upsert replica store != rebuild with the novel doc")
    assert(got.assignments.filter($"doc_id" === 9999L).count() === 1L)
    // idempotence: re-sending CURRENT text is a byte no-op
    val same = corpus.filter(_._1 % 5 == 2)
    val noop = ReplicatedIndex.update(rep, same.toDF("doc_id", "text"))
    assert(pBytes(noop.primaryStore) == pBytes(rep.primaryStore),
      "identical update changed a primary block")
    assert(rBytes(noop.replicaStore) == rBytes(rep.replicaStore),
      "identical update changed a replica block")
  }

  test("update passthrough: blocks of buckets holding no updated id " +
    "pass through byte-identical (never re-coded)") {
    val rep = ReplicatedIndex.build(docs, 4)
    // one updated doc -> exactly one touched bucket (doc_id DIV 100)
    val upd = Seq((42L, "alpha beta w3 w3 edit"))
    val got = ReplicatedIndex.update(rep, upd.toDF("doc_id", "text"))
    val beforeP = pBytes(rep.primaryStore)
    val afterP = pBytes(got.primaryStore)
    val untouched = beforeP.keys.filter(_._3 != 0L) // bucket != 42/100
    assert(untouched.nonEmpty)
    untouched.foreach { k =>
      assert(afterP.get(k).contains(beforeP(k)),
        s"untouched primary block $k was re-coded")
    }
    val beforeR = rBytes(rep.replicaStore)
    val afterR = rBytes(got.replicaStore)
    beforeR.keys.filter(_._4 != 0L).foreach { k =>
      assert(afterR.get(k).contains(beforeR(k)),
        s"untouched replica block $k was re-coded")
    }
  }

  test("update consequence: EVERY failover selection serves the NEW " +
    "version — no copy can serve stale text") {
    val rep = ReplicatedIndex.build(docs, 4)
    val upd = corpus.filter(_._1 % 5 == 2)
      .map { case (i, _) => (i, "alpha alpha alpha w3 t2") }
    val got = ReplicatedIndex.update(rep, upd.toDF("doc_id", "text"))
    val post = corpus.map { case (i, t) =>
      (i, if (i % 5 == 2) "alpha alpha alpha w3 t2" else t) }
    val want = rows(ReplicatedIndex.servePrimary(
      ReplicatedIndex.build(post.toDF("doc_id", "text"), 4), qTerms, 15))
    assert(want.nonEmpty)
    assert(rows(ReplicatedIndex.servePrimary(got, qTerms, 15)) == want)
    for (x <- 0L until 4L)
      assert(rows(ReplicatedIndex.serveFailover(got, x, qTerms, 15))
        == want, s"failover of node $x served a stale version")
  }

  test("dropReplicas (q329): the demoted store and dl pass through " +
    "byte-untouched, and addReplicas round-trips both frames") {
    val rep = ReplicatedIndex.build(docs, 4)
    val (store, dl) = ReplicatedIndex.dropReplicas(rep)
    assert(pBytes(store) == pBytes(rep.primaryStore),
      "dropReplicas changed a primary byte")
    val back = ReplicatedIndex.addReplicas(store, dl, 4)
    assert(pBytes(back.primaryStore) == pBytes(rep.primaryStore),
      "round trip changed the primary store")
    assert(rBytes(back.replicaStore) == rBytes(rep.replicaStore),
      "round trip changed the replica store")
  }
}
