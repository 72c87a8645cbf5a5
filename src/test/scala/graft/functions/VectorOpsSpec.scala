package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpecBase {

  private def one(c: org.apache.spark.sql.Column): Double = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)
  }

  test("dot is the exact sequential fold") {
    val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val b = array(lit(4.0f), lit(-5.0f), lit(6.0f))
    assert(one(VectorOps.dot(a, b)) === (4.0 - 10.0 + 18.0))
  }

  test("cosine of identical vectors is 1") {
    val a = array(lit(0.5f), lit(-0.25f), lit(2.0f))
    assert(math.abs(one(VectorOps.cosine(a, a)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val a = array(lit(1.0f), lit(0.0f))
    val b = array(lit(0.0f), lit(1.0f))
    assert(one(VectorOps.cosine(a, b)) === 0.0)
  }

  test("micros quantization equals Math.rint(x*1e6) — the documented contract") {
    val s = spark
    import s.implicits._
    // Values chosen near .5 micro boundaries; binary doubles don't land
    // exactly on halves, so the contract is "whatever rint of the double
    // product gives", which is what DuckDB's double->DECIMAL(_,6) does too.
    val xs = Seq(1.0000005, 2.0000015, -0.0000005, 0.1234567, -3.999999949)
    val got = xs.toDF("x").select(VectorOps.micros(col("x")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map(x => Math.rint(x * 1e6).toLong))
  }

  test("micro-sum is partitioning-invariant where double-sum is not") {
    val s = spark
    import s.implicits._
    val xs = (1 to 10000).map(i => 1.0 / i)
    val df = s.sparkContext.parallelize(xs, 16).toDF("x")
    val m1 = df.repartition(1).agg(sum(VectorOps.micros(col("x")))).head().getLong(0)
    val m16 = df.repartition(16).agg(sum(VectorOps.micros(col("x")))).head().getLong(0)
    assert(m1 === m16)
  }

  test("int8 quantization: bytes bounded, reconstruction error <= amax/254 " +
    "+ dust, cosine preserved to ~1e-3, zero vector safe") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))) :+
      (99L, Array.fill(64)(0f))
    val df = vecs.toDF("id", "v")
      .withColumn("amax", VectorOps.absMax($"v"))
      .withColumn("q", VectorOps.quantize8($"v", $"amax"))
      .withColumn("dq", VectorOps.dequantize8($"q", $"amax"))
    val rows = df.select($"id", $"amax", $"q", $"dq", $"v").collect()
    rows.foreach { r =>
      val amax = r.getDouble(1)
      val q = r.getSeq[Byte](2)
      val dq = r.getSeq[Double](3)
      val v = r.getSeq[Float](4)
      assert(q.forall(b => b >= -127 && b <= 127))
      if (r.getLong(0) == 99L) assert(q.forall(_ == 0) && dq.forall(_ == 0.0))
      else {
        v.zip(dq).foreach { case (x, xr) =>
          assert(math.abs(x - xr) <= amax / 254.0 + 1e-9,
            s"err ${math.abs(x - xr)} vs bound ${amax / 254.0}") }
        val cos = {
          val d = v.zip(dq).map { case (x, y) => x.toDouble * y }.sum
          d / (math.sqrt(v.map(x => x.toDouble * x).sum) *
            math.sqrt(dq.map(y => y * y).sum))
        }
        assert(cos > 0.999, s"cosine drift too large: $cos")
      }
    }
  }
}
