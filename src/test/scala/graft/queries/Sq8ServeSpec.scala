package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** N21b pins for q286 — serving through the SQ8 store:
  *  - recall floor vs the UNQUANTIZED exact top-10 on real sf0.001
  *    embeddings (the trade the oracle's replay gates but cannot
  *    judge) — measured and pinned, not asserted blind;
  *  - the candidate wire bound: stage 1 hands stage 2 exactly ≤ 50
  *    rows per query;
  *  - the rank-invariance algebra: dropping the /127² common factor
  *    never reorders — scaled-code distance and dequantized-double
  *    distance agree on a hand fixture;
  *  - zero-vector robustness: an all-zero embedding (amax = 0)
  *    quantizes to zero codes and serves without dividing by zero.
  */
class Sq8ServeSpec extends SparkSpecBase {
  import spark.implicits._

  private def exactTop10(): Map[Long, Seq[Long]] = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val mv = emb.select($"vec_id",
      graft.functions.VectorOps.microsVec($"embedding").as("mv"))
    val q = mv.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"mv".as("q_mv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"edist".asc, $"vec_id".asc)
    mv.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .withColumn("edist", expr(
        """aggregate(zip_with(q_mv, mv, (x, y) -> (x - y) * (x - y)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"q_id", $"vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
  }

  test("served top-10 recall vs the unquantized exact top-10 is >= 0.8") {
    val served = Vectors.q286.build(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
    val exact = exactTop10()
    val recalls = exact.map { case (qid, ex) =>
      served.getOrElse(qid, Set.empty).count(ex.contains).toDouble / ex.size
    }
    assert(recalls.nonEmpty && recalls.forall(_ >= 0.8),
      s"per-query recalls: ${recalls.mkString(", ")}")
  }

  test("stage 1 hands stage 2 at most 50 candidates per query") {
    // re-derive the candidate frame exactly as q286 builds it
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val codes = emb
      .select($"vec_id", $"embedding",
        graft.functions.VectorOps.absMax($"embedding").as("amax"))
      .select($"vec_id", rint($"amax" * lit(1e3)).cast(LongType).as("am"),
        graft.functions.VectorOps.quantize8($"embedding", $"amax").as("qv"))
    val q = codes.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"am".as("q_am"), $"qv".as("q_qv"))
    val top50 = udaf(new graft.functions.TopKLong(50))
    val counts = codes.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .withColumn("adist", expr(
        """aggregate(zip_with(q_qv, qv,
             (x, y) -> (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am) *
                       (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .groupBy($"q_id").agg(top50(-$"adist", $"vec_id", lit(0L)).as("tk"))
      .select(size($"tk").as("n")).collect().map(_.getInt(0))
    assert(counts.length == 4 && counts.forall(_ <= 50))
  }

  test("dropping /127² is rank-invariant: code distance == dequantized order") {
    // hand corpus with distinct scales; compare the integer scaled-code
    // order against the dequantized-double distance order
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)),
      (1L, Array(0.9f, 0.1f, 0.4f)),
      (2L, Array(-1.0f, 2.0f, 0.0f)),
      (3L, Array(0.2f, 0.2f, 0.2f)),
      (4L, Array(4.0f, -1.0f, 1.0f))).toDF("vec_id", "embedding")
    val codes = vecs
      .select($"vec_id", $"embedding",
        graft.functions.VectorOps.absMax($"embedding").as("amax"))
      .select($"vec_id", $"amax",
        rint($"amax" * lit(1e3)).cast(LongType).as("am"),
        graft.functions.VectorOps.quantize8($"embedding", $"amax").as("qv"))
    val q = codes.filter($"vec_id" === 0L)
      .select($"am".as("q_am"), $"qv".as("q_qv"), $"amax".as("q_amax"))
    val both = codes.filter($"vec_id" =!= 0L).crossJoin(q)
      .withColumn("adist", expr(
        """aggregate(zip_with(q_qv, qv,
             (x, y) -> (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am) *
                       (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .withColumn("ddist", expr(
        """aggregate(zip_with(q_qv, qv,
             (x, y) -> (CAST(x AS DOUBLE) * q_amax / 127 -
                        CAST(y AS DOUBLE) * amax / 127) *
                       (CAST(x AS DOUBLE) * q_amax / 127 -
                        CAST(y AS DOUBLE) * amax / 127)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""))
      .select($"vec_id", $"adist", $"ddist").collect()
    val byCode = both.sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val byDeq = both.sortBy(r => (r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
    // the millis scale rounds amax to 10⁻³ — identical ordering on this
    // fixture, where gaps are far above the rounding dust
    assert(byCode == byDeq)
  }

  test("q296 sharded scatter-gather equals unsharded q286 row for row " +
    "(the containment law with no stats step at all)") {
    val sharded = Vectors.q296.build(spark, sf).collect().map(_.toSeq).toSeq
    val single = Vectors.q286.build(spark, sf).collect().map(_.toSeq).toSeq
    assert(sharded.nonEmpty && sharded == single,
      "sharded SQ8 serve diverged from the single-store serve")
  }

  test("q296 per-shard stage-1 wire bound: every (shard, query) ships " +
    "at most 50 candidate rows to the gather") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val codes = emb
      .select($"vec_id", $"embedding",
        graft.functions.VectorOps.absMax($"embedding").as("amax"))
      .select(pmod($"vec_id", lit(4L)).as("shard"), $"vec_id",
        rint($"amax" * lit(1e3)).cast(LongType).as("am"),
        graft.functions.VectorOps.quantize8($"embedding", $"amax").as("qv"))
    val q = codes.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"am".as("q_am"), $"qv".as("q_qv"))
    val top50 = udaf(new graft.functions.TopKLong(50))
    val sizes = codes.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .withColumn("adist", expr(
        """aggregate(zip_with(q_qv, qv,
             (x, y) -> (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am) *
                       (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .groupBy($"shard", $"q_id")
      .agg(top50(-$"adist", $"vec_id", lit(0L)).as("tk"))
      .select(size($"tk").as("n")).collect().map(_.getInt(0))
    assert(sizes.length <= 16 && sizes.forall(_ <= 50),
      s"per-(shard, query) candidate sizes: ${sizes.mkString(",")}")
  }

  test("a zero vector quantizes to zero codes and serves without crashing") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.1f, 1.9f))).toDF("vec_id", "embedding")
    val codes = vecs
      .select($"vec_id", $"embedding",
        graft.functions.VectorOps.absMax($"embedding").as("amax"))
      .select($"vec_id", rint($"amax" * lit(1e3)).cast(LongType).as("am"),
        graft.functions.VectorOps.quantize8($"embedding", $"amax").as("qv"))
    val z = codes.filter($"vec_id" === 1L).collect()(0)
    assert(z.getLong(1) == 0L)
    assert(z.getSeq[Byte](2).forall(_ == 0))
    val q = codes.filter($"vec_id" === 0L)
      .select($"am".as("q_am"), $"qv".as("q_qv"))
    val d = codes.crossJoin(q)
      .withColumn("adist", expr(
        """aggregate(zip_with(q_qv, qv,
             (x, y) -> (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am) *
                       (CAST(x AS BIGINT) * q_am - CAST(y AS BIGINT) * am)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .collect()
    assert(d.length == 3 && d.forall(_.getLong(3) >= 0L))
  }
}
