package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Integer-exact k-means over embedding vectors (SURVEY.md §2.11a N23)
  * — the semantic-clustering step a training-data pipeline runs for
  * cluster-balanced sampling, semantic dedup, and topic bucketing at
  * corpus scale.
  *
  * Floating-point k-means can never hash-match across engines: centroid
  * means depend on summation order, which depends on partitioning. This
  * variant quantizes every vector ONCE onto a fixed integer grid
  * (`round(x·10⁴) + 10⁴` per dimension — two exactly-rounded IEEE ops,
  * ties away from zero in both Spark HALF_UP and DuckDB, then a shift
  * that keeps every coordinate positive so `div` truncation-vs-floor
  * can never diverge), and from there every distance, comparison, and
  * centroid update is pure BIGINT math: squared L2 distances are exact
  * sums, centroid means are truncating integer division of exact sums,
  * and ties in the argmin break to the smallest cluster id. The
  * clustering is therefore bit-identical on any engine, partitioning,
  * or reprocess — q67/q80/q103's determinism family, applied to the
  * iterative-ML primitive. (The q106 int8 quantizer is per-vector-scale
  * — right for storage, wrong for cross-vector distances; this grid is
  * corpus-global.)
  *
  * Scale shape per round: one broadcast of the k-row centroid table
  * against the vector corpus (never a shuffle of vectors), one
  * argmin window partitioned by vector id (AQE-sized), one
  * posexplode + (cluster, dim) aggregate for the update — shuffle
  * volume is k·dims longs, independent of corpus size. Rounds are a
  * fixed small constant (training-data clustering runs 2–10 rounds on
  * a sample, then assigns the full corpus once).
  */
object KMeansInt {

  /** Corpus-global integer grid: `round(x·10⁴) + 10⁴` per dimension.
    * float→double widening is exact; the multiply and round are single
    * exactly-rounded IEEE ops; the +10⁴ shift keeps coordinates
    * positive (|x| < 1 in this corpus — assert wider domains upstream)
    * so integer division in the update step truncates identically
    * everywhere. Squared distances are translation-invariant, so the
    * shift never changes an assignment. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 10000d).cast("long") + 10000L)

  /** Exact squared L2 between two equal-length long arrays. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** One assignment pass: each vector to its nearest centroid (exact
    * BIGINT distance, ties to the smallest cluster id).
    * @param vecs (idCol, xq: array<long>)  @param cents (cluster, cq) */
  def assign(vecs: DataFrame, idCol: String, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__d"), col("cluster"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__d", sqDist(col("xq"), col("cq")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster"), col("__d").as("dist"), col("xq"))
  }

  /** Centroid update: per-dimension truncating integer mean of the
    * assigned vectors. A cluster that captured no vectors emits no row
    * (standard empty-cluster drop — deterministic in both engines). */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("xq")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("q", expr("s div n"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("q")))),
        c => c.getField("q")).as("cq"))

  /** Full run: quantize, seed centroids from the `k` smallest ids
    * (deterministic, engine-agnostic), `rounds` assign/update cycles,
    * one final assignment. Returns (idCol, cluster, dist). */
  def cluster(vecs: DataFrame, idCol: String, vecCol: String,
              k: Int, rounds: Int): DataFrame =
    clusterWithCents(vecs, idCol, vecCol, k, rounds)._1

  /** [[cluster]], also returning the trained centroid table
    * (cluster, cq) — callers that probe AGAINST the centroids (IVF-PQ
    * coarse cells, q196) need the table itself, not just the
    * assignments. */
  def clusterWithCents(vecs: DataFrame, idCol: String, vecCol: String,
                       k: Int, rounds: Int): (DataFrame, DataFrame) =
    clusterWithCentsQ(
      vecs.select(col(idCol), quantize(col(vecCol)).as("xq")), idCol, k, rounds)

  /** [[clusterWithCents]] over an ALREADY-quantized `xq` array<long>
    * column — callers whose vectors are integer-born (the RAG chunk
    * embeddings, q202/q206; PQ residuals) must not re-quantize. */
  def clusterWithCentsQ(vecsQ: DataFrame, idCol: String,
                        k: Int, rounds: Int): (DataFrame, DataFrame) = {
    val vq = vecsQ.select(col(idCol), col("xq")).persist()
    val init = vq.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("int").as("cluster"), col("xq").as("cq"))
    val finalCents = (1 to rounds).foldLeft(init) { (cents, _) =>
      // k·dims longs — localCheckpoint keeps the per-round plan flat
      // instead of nesting every prior round's join into the next
      update(assign(vq, idCol, cents)).barrier()
    }
    // Materialize the final (and most expensive) assignment pass while
    // the quantized corpus is still cached — unpersisting first would
    // make that pass recompute the quantization it was cached for.
    val out = assign(vq, idCol, finalCents).drop("xq").barrier()
    vq.unpersist()
    (out, finalCents)
  }
}
