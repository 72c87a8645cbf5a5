package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X122 pins for [[ReplicatedCodes]] (q303):
  *  - placement: primary ≠ replica for every vec, every vec placed;
  *  - the row law: both copies carry IDENTICAL (vec_id, am, qv)
  *    payloads — the replica store re-keyed to its origin equals the
  *    primary store as a set (the byte law's row-store analogue);
  *  - failover candidate-invariance for EVERY choice of failed node
  *    (code distance is per-pair — no stats step, so any
  *    corpus-partitioning selection serves identical candidates);
  *  - replica-routed serve ≡ primary serve (read shedding);
  *  - failover routing: with node x down nothing serves FROM x, and
  *    x's vecs are answered by their replica nodes;
  *  - loss recovery: recovered ≡ from-scratch S−1 build (set equality,
  *    both stores + assignments) with the promotion law (every
  *    lost-primary vec's new primary IS its old replica).
  */
class ReplicatedCodesSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic synthetic SQ8 code rows: 8-dim codes in [-127, 127],
  // per-vec exact-millis scale — the (vec_id, am, qv) surface q286 mints
  private val corpus = (0L until 240L).map { i =>
    val qv = Seq.tabulate(8)(d => ((i * 7 + d * 13) % 255 - 127))
    (i, 1000L + i % 50, qv)
  }
  private def codes = corpus.toDF("vec_id", "am", "qv")
  private def queries = codes.filter($"vec_id" < 3)
    .select($"vec_id".as("q_id"), $"am".as("q_am"), $"qv".as("q_qv"))

  private def candSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long)] =
    df.select("q_id", "vec_id", "adist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("placement: every vec placed once, primary != replica everywhere") {
    val rep = ReplicatedCodes.build(codes, 4)
    assert(rep.assignments.count() === corpus.size.toLong)
    assert(rep.assignments.filter($"primary" === $"replica").count() === 0L,
      "a vec's two copies landed on one node")
  }

  test("row law: the replica store re-keyed to its origin equals the " +
    "primary store as a set — both copies carry identical payloads") {
    val rep = ReplicatedCodes.build(codes, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3).toSeq)).toSet
    val prim = rows(rep.primaryStore
      .select($"shard", $"vec_id", $"am", $"qv"))
    val repl = rows(rep.replicaStore
      .select($"origin".as("shard"), $"vec_id", $"am", $"qv"))
    assert(prim == repl, "replica payloads diverge from primaries")
  }

  test("failover candidate-invariance: dropping ANY one node changes " +
    "no (q_id, vec_id, adist) candidate") {
    val rep = ReplicatedCodes.build(codes, 4)
    val base = candSet(ReplicatedCodes.servePrimary(rep, queries, 10))
    assert(base.nonEmpty, "empty baseline serve")
    for (x <- 0L until 4L)
      assert(candSet(ReplicatedCodes.serveFailover(rep, x, queries, 10))
        == base, s"failover of node $x changed the candidate set")
  }

  test("replica-routed serve == primary serve (read shedding)") {
    val rep = ReplicatedCodes.build(codes, 4)
    assert(candSet(ReplicatedCodes.serveReplica(rep, queries, 10)) ==
      candSet(ReplicatedCodes.servePrimary(rep, queries, 10)))
  }

  test("failover routing: nothing serves FROM the dead node; its vecs " +
    "are answered by their replica nodes") {
    val failed = 2L
    val rep = ReplicatedCodes.build(codes, 4)
    val served = ReplicatedCodes.serveFailover(rep, failed, queries, 10)
      .join(rep.assignments, "vec_id")
      .select($"vec_id", $"node", $"primary", $"replica").collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      assert(r.getLong(1) !== failed,
        s"vec ${r.getLong(0)} served from the dead node")
      if (r.getLong(2) == failed)
        assert(r.getLong(1) === r.getLong(3),
          s"dead node's vec ${r.getLong(0)} not served by its replica")
      else
        assert(r.getLong(1) === r.getLong(2),
          s"healthy vec ${r.getLong(0)} not served by its primary")
    }
  }

  test("loss recovery: recovered == from-scratch 3-node build (set " +
    "equality, both stores + assignments)") {
    val rep = ReplicatedCodes.build(codes, 4)
    val rec = ReplicatedCodes.recoverLost(rep, 4)
    val want = ReplicatedCodes.build(codes, 3)
    def pSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3).toSeq)).toSet
    assert(pSet(rec.primaryStore) == pSet(want.primaryStore),
      "recovered primary store != from-scratch build")
    assert(pSet(rec.replicaStore
      .select($"node", $"vec_id", $"am", $"qv")) ==
      pSet(want.replicaStore.select($"node", $"vec_id", $"am", $"qv")),
      "recovered replica rows != from-scratch build")
    def aMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aMap(rec.assignments) == aMap(want.assignments))
    // the full (node, origin) key too — not just the node component
    def rSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getSeq[Int](4).toSeq)).toSet
    assert(rSet(rec.replicaStore
      .select($"node", $"origin", $"vec_id", $"am", $"qv")) ==
      rSet(want.replicaStore
        .select($"node", $"origin", $"vec_id", $"am", $"qv")))
  }

  test("grow: grown == from-scratch S+1 build (set equality, both " +
    "stores + assignments), at two ring sizes; grow then recoverLost " +
    "round-trips") {
    def pSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3).toSeq)).toSet
    def rSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getSeq[Int](4).toSeq)).toSet
    for (s0 <- Seq(2, 3)) {
      val rep = ReplicatedCodes.build(codes, s0)
      val grown = ReplicatedCodes.grow(rep, s0)
      val want = ReplicatedCodes.build(codes, s0 + 1)
      assert(pSet(grown.primaryStore) == pSet(want.primaryStore),
        s"grow $s0 -> ${s0 + 1}: primary rows diverged")
      assert(rSet(grown.replicaStore) == rSet(want.replicaStore),
        s"grow $s0 -> ${s0 + 1}: replica rows diverged")
    }
    // round-trip: grow 3->4 then lose node 3 recovers the 3-ring build
    val rep3 = ReplicatedCodes.build(codes, 3)
    val back = ReplicatedCodes.recoverLost(
      ReplicatedCodes.grow(rep3, 3), 4)
    assert(pSet(back.primaryStore) == pSet(rep3.primaryStore))
    assert(rSet(back.replicaStore) == rSet(rep3.replicaStore))
  }

  test("grow class laws: a moved primary lands on the NEW shard with " +
    "its old primary as replica; a moved replica lands on the new shard") {
    val rep = ReplicatedCodes.build(codes, 3)
    val grown = ReplicatedCodes.grow(rep, 3)
    val joined = rep.assignments
      .select($"vec_id", $"primary".as("op"), $"replica".as("or"))
      .join(grown.assignments, "vec_id").collect()
    var (nA, nB) = (0, 0)
    joined.foreach { r =>
      val (op, or, np, nr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (np != op) {
        nA += 1
        assert(np === 3L, s"vec ${r.getLong(0)}: moved primary not on " +
          "the new shard")
        assert(nr === op, s"vec ${r.getLong(0)}: old primary did not " +
          "become the replica")
      } else if (nr != or) {
        nB += 1
        assert(nr === 3L, s"vec ${r.getLong(0)}: moved replica not on " +
          "the new shard")
      }
    }
    assert(nA > 0 && nB > 0, s"fixture too weak: classes A=$nA B=$nB")
  }

  test("write verbs: takedown anti-joins BOTH copies (unknown ids " +
    "no-op), re-embed is a payload swap that never moves placement, " +
    "upsert places fresh, failover stays invariant after maintenance") {
    val rep = ReplicatedCodes.build(codes, 4)
    val dead = corpus.map(_._1).filter(_ % 9 == 5)
    val cut = ReplicatedCodes.takedown(rep, dead.toDF("vec_id"))
    // takedown == rebuild over survivors, both stores
    val survivors = corpus.filterNot(c => c._1 % 9 == 5)
    def pSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Int](3).toSeq)).toSet
    assert(pSet(cut.primaryStore) ==
      pSet(ReplicatedCodes.build(survivors.toDF("vec_id", "am", "qv"), 4)
        .primaryStore))
    // unknown ids are no-ops
    val noop = ReplicatedCodes.takedown(rep, Seq(99999L).toDF("vec_id"))
    assert(pSet(noop.primaryStore) == pSet(rep.primaryStore))
    assert(pSet(noop.replicaStore
      .select($"node", $"vec_id", $"am", $"qv")) ==
      pSet(rep.replicaStore.select($"node", $"vec_id", $"am", $"qv")))
    // re-embed: new payload, SAME placement; upsert id places fresh
    val newCodes = (survivors.take(20).map { case (id, am, _) =>
      (id, am + 1, Seq.tabulate(8)(d => (d * 3 + 1).toLong)) } :+
      ((5000L, 1200L, Seq.tabulate(8)(d => (d + 1).toLong))))
      .toDF("vec_id", "am", "qv")
    val upd = ReplicatedCodes.update(cut, newCodes)
    def aMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val before = aMap(cut.assignments)
    val after = aMap(upd.assignments)
    before.foreach { case (id, pr) =>
      assert(after(id) === pr, s"re-embed moved vec $id")
    }
    assert(after.contains(5000L) && !before.contains(5000L),
      "upsert id not placed")
    assert(after(5000L)._1 !== after(5000L)._2)
    // maintained == rebuild over the post-maintenance corpus
    val updatedIds = survivors.take(20).map(_._1).toSet
    val postCorpus = (survivors.map { case (id, am, qv) =>
      if (updatedIds.contains(id))
        (id, am + 1, Seq.tabulate(8)(d => (d * 3 + 1).toLong))
      else (id, am, qv)
    } :+ ((5000L, 1200L, Seq.tabulate(8)(d => (d + 1).toLong))))
    val want = ReplicatedCodes.build(
      postCorpus.toDF("vec_id", "am", "qv"), 4)
    assert(pSet(upd.primaryStore) == pSet(want.primaryStore),
      "maintained primary != rebuild over post-maintenance corpus")
    assert(pSet(upd.replicaStore
      .select($"node", $"vec_id", $"am", $"qv")) ==
      pSet(want.replicaStore.select($"node", $"vec_id", $"am", $"qv")),
      "maintained replica != rebuild")
    // failover still candidate-invariant after the verbs
    val base = candSet(ReplicatedCodes.servePrimary(upd, queries, 10))
    assert(base.nonEmpty)
    for (x <- 0L until 4L)
      assert(candSet(ReplicatedCodes.serveFailover(upd, x, queries, 10))
        == base, s"failover of node $x diverged after maintenance")
  }

  test("promotion law: every lost-primary vec's new primary IS its old " +
    "replica") {
    val rep = ReplicatedCodes.build(codes, 4)
    val rec = ReplicatedCodes.recoverLost(rep, 4)
    val diverged = rep.assignments.filter($"primary" === 3L)
      .select($"vec_id", $"replica".as("old_replica"))
      .join(rec.assignments.select($"vec_id", $"primary".as("new_primary")),
        "vec_id")
      .filter($"new_primary" =!= $"old_replica")
    assert(rep.assignments.filter($"primary" === 3L).count() > 0L,
      "planted corpus gave node 3 no primaries — pin is vacuous")
    assert(diverged.count() === 0L, "promotion law violated")
  }
}
