package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.core.Tables
import graft.functions.VectorOps

/** Recall properties of the probe-count IVF path (N13): the number a
  * user needs before trusting the approximate path at scale is
  * recall-vs-exact at each nProbe, so this spec measures it against
  * brute-force ground truth on three disjoint query sets and pins the
  * scaladoc's trade-off table as lower bounds. */
class IvfAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 10
  private lazy val emb =
    Tables(spark, sf, "embeddings").select($"vec_id", $"embedding")
  private lazy val cents = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
  private lazy val assigned = IvfAnn.assign(emb, "vec_id", "embedding", cents)
  // three disjoint, seed-fixed probe sets of 10 queries each
  private val querySets: Seq[(Long, Long)] = Seq((100L, 110L), (200L, 210L), (300L, 310L))

  private def queries(lo: Long, hi: Long): DataFrame =
    emb.filter($"vec_id" >= lo && $"vec_id" < hi)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))

  private def truthTopK(lo: Long, hi: Long): Map[Long, Set[Long]] = {
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    queries(lo, hi).crossJoin(emb).filter($"vec_id" =!= $"q_id")
      .withColumn("cos", VectorOps.cosine($"q_vec", $"embedding"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= K)
      .select($"q_id", $"vec_id")
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }
  }

  private def recallAt(lo: Long, hi: Long, nProbe: Int): Double = {
    val truth = truthTopK(lo, hi)
    val got = IvfAnn.topK(assigned, "vec_id", "embedding",
        queries(lo, hi), cents, K, nProbe)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(2)).toSet
      }
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("structureless corpus: recall@10 >= 0.8*nProbe/k on every probe " +
    "set, monotone in nProbe, EXACTLY 1.0 at nProbe = k") {
    // near-random embeddings are IVF's worst case: neighbors scatter
    // uniformly over cells, so recall ~ nProbe/k (measured 0.17-0.28 at
    // 1 probe, 0.58-0.72 at 4, k=8) — pin 80% of the uniform line
    for ((lo, hi) <- querySets) {
      val r = Seq(1, 2, 4, 8).map(p => p -> recallAt(lo, hi, p)).toMap
      for (p <- Seq(1, 2, 4))
        assert(r(p) >= 0.8 * p / 8.0, s"recall@10 nProbe=$p on [$lo,$hi) = ${r(p)}")
      assert(r(1) <= r(2) && r(2) <= r(4) && r(4) <= r(8),
        s"recall not monotone on [$lo,$hi): $r")
      // probing every cell IS brute force — pruning skips, never rescores
      assert(r(8) === 1.0)
    }
  }

  test("clustered corpus (what IVF is FOR): recall@10 >= 0.95 at ONE probe") {
    // 8 tight clusters around orthogonal-ish deterministic anchors
    val rnd = new scala.util.Random(11)
    val dim = 16
    val anchors = Array.fill(8, dim)(rnd.nextFloat() * 2 - 1)
    val vecs = (0 until 400).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(dim)(d =>
        anchors(c)(d) * 10f + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val cc = vecs.filter($"vec_id" < 8)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val asg = IvfAnn.assign(vecs, "vec_id", "embedding", cc)
    val qs = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    val truth = qs.crossJoin(vecs).filter($"vec_id" =!= $"q_id")
      .withColumn("cos", VectorOps.cosine($"q_vec", $"embedding"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= K)
      .select($"q_id", $"vec_id").collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val got = IvfAnn.topK(asg, "vec_id", "embedding", qs, cc, K, nProbe = 1)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val recall = per.sum / per.size
    assert(recall >= 0.95, s"clustered recall@10 at 1 probe = $recall")
  }

  test("assignment is total and deterministic: every vector lands in " +
    "exactly one cell, ties broken to the smaller centroid id") {
    assert(assigned.count() === emb.count())
    assert(assigned.select($"vec_id").distinct().count() === emb.count())
    def cellOf(df: DataFrame): Map[Long, Long] =
      df.select($"vec_id", $"c_id").collect()
        .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue()).toMap
    assert(cellOf(IvfAnn.assign(emb, "vec_id", "embedding", cents)) === cellOf(assigned))
  }
}
