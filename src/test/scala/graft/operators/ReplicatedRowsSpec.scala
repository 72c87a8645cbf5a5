package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X122d pins for [[ReplicatedRows]] (q318):
  *  - the partition law: for EVERY choice of failed node, the failover
  *    selection returns exactly the original row multiset (each row
  *    once, from a surviving copy) — the property every downstream
  *    pure-function-of-the-set computation rests on;
  *  - co-placement: a given id's rows land on the same (primary,
  *    replica) pair across DIFFERENT stores (codes + adjacency share a
  *    home — the locality claim q318's scaladoc makes);
  *  - traversal invariance: a layered beam search over the failover
  *    selection equals the single-copy search for EVERY failed node on
  *    a planted graph (iterative reads — one lost row changes paths,
  *    so this is not implied by any single-scan argument).
  */
class ReplicatedRowsSpec extends SparkSpecBase {
  import spark.implicits._

  // planted vectors: 60 ids, 4-dim integer grid
  private val vqRows = (0L until 60L).map { i =>
    (i, Seq.tabulate(4)(d => 1000L + (i * 13 + d * 7) % 90))
  }
  private def vq = vqRows.toDF("vec_id", "xq")
  // planted graph: ring + skip edges (connected, deterministic)
  private val edgeRows = (0L until 60L).flatMap { v =>
    Seq((v, (v + 1) % 60), (v, (v + 7) % 60), (v, (v + 19) % 60))
  }
  private def edges = edgeRows.toDF("v", "u")

  test("partition law: failover returns the exact original row " +
    "multiset for EVERY failed node") {
    val (p, r) = ReplicatedRows.build(edges, "v", 4)
    val want = edgeRows.sorted
    for (x <- 0L until 4L) {
      val got = ReplicatedRows.failover(p, r, x)
        .collect().map(row => (row.getLong(0), row.getLong(1)))
        .toSeq.sorted
      assert(got === want, s"failover of node $x lost or duplicated rows")
    }
  }

  test("co-placement: an id's rows share their (primary, replica) " +
    "pair across stores (codes and adjacency live together)") {
    val (vqP, _) = ReplicatedRows.build(vq, "vec_id", 4)
    val (eP, _) = ReplicatedRows.build(edges, "v", 4)
    val vqHome = vqP.select($"vec_id", $"shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    eP.select($"v", $"shard").collect().foreach { r =>
      assert(vqHome(r.getLong(0)) === r.getLong(1),
        s"vertex ${r.getLong(0)}'s adjacency landed off its codes' node")
    }
  }

  test("traversal invariance: the beam search over the failover " +
    "selection equals the single-copy search for EVERY failed node") {
    val queries = vq.filter($"vec_id" % 17 === 3)
      .select($"vec_id".as("q_id"), $"xq")
    val entries = vq.filter($"vec_id" === 0).select($"vec_id".as("id"))
    def run(vqf: org.apache.spark.sql.DataFrame,
        ef: org.apache.spark.sql.DataFrame) =
      GraphAnn.beamSearch(vqf, "vec_id", ef, queries, entries,
        beam = 3, rounds = 3, k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
        .toSeq.sorted
    val base = run(vq, edges)
    assert(base.nonEmpty, "empty baseline traversal")
    val (vqP, vqR) = ReplicatedRows.build(vq, "vec_id", 4)
    val (eP, eR) = ReplicatedRows.build(edges, "v", 4)
    for (x <- 0L until 4L) {
      val got = run(ReplicatedRows.failover(vqP, vqR, x),
        ReplicatedRows.failover(eP, eR, x))
      assert(got === base, s"failover of node $x changed the traversal")
    }
  }
}
