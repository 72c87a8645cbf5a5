package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkSpecBase {

  test("computes the micro-exact dimension-wise mean") {
    val s = spark
    import s.implicits._
    val vecMean = udaf(new VectorMean(2))
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(5.0f, 6.0f))
    ).toDF("k", "v")
    val out = df.groupBy($"k").agg(vecMean($"v").as("m")).orderBy($"k")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(out(0) === ((1, Seq(2.0, 3.0))))
    assert(out(1) === ((2, Seq(5.0, 6.0))))
  }

  test("is partition-order invariant (long-micro buffer)") {
    val s = spark
    import s.implicits._
    val vecMean = udaf(new VectorMean(4))
    val data = (1 to 5000).map(i => (i % 3, Seq(1.0f / i, 2.0f / i, 3.0f / i, 4.0f / i)))
    def run(parts: Int) =
      data.toDF("k", "v").repartition(parts)
        .groupBy($"k").agg(vecMean($"v").as("m")).orderBy($"k")
        .collect().map(_.getSeq[Double](1)).toSeq
    assert(run(1) === run(32))
  }

  test("null vectors are skipped; empty group yields zero vector") {
    val s = spark
    import s.implicits._
    val vecMean = udaf(new VectorMean(2))
    val df = Seq((1, Some(Seq(2.0f, 4.0f))), (1, None))
      .toDF("k", "v")
    val out = df.groupBy($"k").agg(vecMean($"v")).head().getSeq[Double](1)
    assert(out === Seq(2.0, 4.0))
  }
}
