package graft.queries

import graft.SparkSpecBase

/** Invariants for the inference family (q183-q185) beyond the DuckDB
  * value gate: attribution bounds, κ range, and CI ordering.
  */
class InferenceSpec extends SparkSpecBase {

  test("q183 removal effects are valid ppm and base conversion is constant") {
    import spark.implicits._
    val rows = Inference.q183.build(spark, sf)
      .select("base_conv_micro", "removed_conv_micro", "removal_effect_ppm")
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 4)
    assert(rows.map(_._1).distinct.length === 1, "base conv must be constant")
    assert(rows.forall { case (b, r, e) =>
      b > 0 && r >= 0 && r <= b && e >= 0 && e <= 1000000L })
  }

  test("q184 kappa is at most 1 and po is a valid ppm") {
    import spark.implicits._
    val (po, kappa) = Inference.q184.build(spark, sf)
      .select("po_ppm", "kappa_micro").as[(Long, Long)].collect().head
    assert(po >= 0 && po <= 1000000L)
    assert(kappa <= 1000000L)
  }

  test("q184 degenerate raters (pe = 1) yield the NULL sentinel, not a " +
    "NaN-to-0 cast (ADVICE r5)") {
    // every document on the same side of both gates: pe = 1 exactly
    val df = spark.sql(
        "SELECT 10L AS n, 10L AS c11, 0L AS c10, 0L AS c01, 0L AS c00")
      .selectExpr(s"${Inference.kappaMicroSql} AS kappa_micro")
    assert(df.collect().head.isNullAt(0),
      "pe = 1 must produce NULL kappa in both engines")
    // and the guard must NOT fire for a regular contingency table
    val ok = spark.sql(
        "SELECT 10L AS n, 4L AS c11, 2L AS c10, 1L AS c01, 3L AS c00")
      .selectExpr(s"${Inference.kappaMicroSql} AS kappa_micro")
    assert(!ok.collect().head.isNullAt(0))
  }

  test("q185 bootstrap CI is ordered and brackets the point estimate") {
    import spark.implicits._
    val (n, mean, lo, hi) = Inference.q185.build(spark, sf)
      .select("n_docs", "mean_micro", "ci_lo_micro", "ci_hi_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(n > 0)
    assert(lo <= hi)
    // deterministic draw at this fixture: the CI brackets the mean
    assert(lo <= mean && mean <= hi,
      s"P05-P95 CI [$lo, $hi] does not bracket mean $mean")
  }
}
