package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** QualityClassifier (q197) semantics on a fixture with REAL class
  * signal (the synthetic corpus shares one vocabulary across langs, so
  * the oracle row gates algebra, not learning — this pins learning). */
class QualityClassifierSpec extends SparkSpecBase {

  private def docs(rows: (Long, Boolean, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "pos", "text")
  }

  private lazy val fixture = docs(
    (1L, true, "alpha beta alpha common"),
    (2L, true, "beta gamma alpha"),
    (3L, true, "gamma alpha common beta"),
    (4L, false, "delta epsilon common"),
    (5L, false, "epsilon zeta delta delta"),
    (6L, false, "zeta common delta epsilon"))

  test("separable classes score with the right signs and classify " +
    "perfectly in-sample") {
    val s = spark
    import s.implicits._
    val tok = QualityClassifier.tokenTable(fixture, "doc_id", "text", $"pos")
    val w = QualityClassifier.trainWeights(tok)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // positive-exclusive tokens weigh > 0, negative-exclusive < 0
    assert(Seq("alpha", "beta", "gamma").forall(w(_) > 0))
    assert(Seq("delta", "epsilon", "zeta").forall(w(_) < 0))
    val scored = QualityClassifier.score(tok, "doc_id", QualityClassifier.trainWeights(tok))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(scored(_) > 0))
    assert(Seq(4L, 5L, 6L).forall(scored(_) < 0))
  }

  test("weights are a pure function of the corpus multiset " +
    "(repartition-invariant)") {
    val s = spark
    import s.implicits._
    def weights(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.trainWeights(
          QualityClassifier.tokenTable(df, "doc_id", "text", $"pos"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(weights(fixture) === weights(fixture.repartition(13)))
  }

  test("a token seen only in one class dominates a shared token") {
    val s = spark
    import s.implicits._
    val tok = QualityClassifier.tokenTable(fixture, "doc_id", "text", $"pos")
    val w = QualityClassifier.trainWeights(tok)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'common' appears in both classes -> near zero, strictly between
    // the class-exclusive extremes
    assert(math.abs(w("common")) < w("alpha"))
    assert(math.abs(w("common")) < -w("delta"))
  }
}
