package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** NNDescent (q201) convergence contract: exact outputs are the DuckDB
  * oracle's job; this pins that the local-join iteration actually
  * DESCENDS — graph recall against the brute-force KNN graph rises
  * monotonically from a deliberately poor seed, substantially. */
class NNDescentSpec extends SparkSpecBase {

  test("recall vs brute-force top-k rises monotonically over rounds " +
    "from the id-window seed") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val vq = emb.select($"vec_id", KMeansInt.quantize($"embedding").as("xq"))
      .persist()
    val n = vq.count()
    val init = vq.select($"vec_id".as("v"),
        explode(sequence(lit(1), lit(4))).as("i"))
      .select($"v", (($"v" + $"i") % n).as("u"))
    // brute-force ground truth: top-4 per node
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"v").orderBy($"d", $"u")
    val truth = vq.select($"vec_id".as("v"), $"xq".as("xv"))
      .crossJoin(vq.select($"vec_id".as("u"), $"xq".as("xu")))
      .filter($"v" =!= $"u")
      .select($"v", $"u", KMeansInt.sqDist($"xv", $"xu").as("d"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      .select($"v", $"u").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(edges: Array[(Long, Long)]): Double =
      edges.count(truth.contains).toDouble / truth.size
    val byRound = (0 to 2).map { r =>
      recall(NNDescent.build(vq, "vec_id", init, k = 4, rounds = r)
        .select($"v", $"u").collect()
        .map(x => (x.getLong(0), x.getLong(1))))
    }
    vq.unpersist()
    // id-window seed ≈ random (4/499 per node); each local join must
    // improve, and two rounds must multiply recall many-fold
    assert(byRound(0) < byRound(1) && byRound(1) < byRound(2),
      s"recall not monotone: $byRound")
    assert(byRound(2) > 5 * byRound(0),
      s"two rounds did not substantially beat the seed: $byRound")
  }
}
