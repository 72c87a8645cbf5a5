package graft

/** Smoke gate over the whole declared inventory (SURVEY.md §2): every
  * registered query must build, run at sf0.001, and return rows. The
  * value-level check is the DuckDB differential oracle (scripts/check.py,
  * driver t2); this spec catches plan-time regressions (analysis errors,
  * renamed columns, bad casts) in-repo before the driver does.
  */
class RegistrySpec extends SparkSpecBase {

  test("registry has no duplicate query names") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  // Global aggregates return exactly one row; ordering is vacuous.
  private val singleRowQueries = Set("q17_global_agg", "q89_funnel",
    "q158_ab_test", "q160_ks_test", "q166_vocab_richness",
    "q176_effective_rank", "q184_cohens_kappa", "q185_poisson_bootstrap")

  test("every oracle query ends with a deterministic ORDER BY") {
    SparkEntry.registry
      .filter(q => q.oracle.isDefined && !singleRowQueries(q.name))
      .foreach { q =>
        assert(q.oracle.get.toUpperCase.contains("ORDER BY"),
          s"${q.name}: oracle SQL lacks ORDER BY — hash compare would be order-dependent")
      }
  }

  test("scalar-UDF policy: no ScalaUDF in any registered query's plan " +
    "(SURVEY §2.11 — column exprs/HOFs or a native Expression; typed " +
    "Aggregators and the mapPartitions codec boundary are separate nodes " +
    "and remain allowed)") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    SparkEntry.registry.foreach { q =>
      val plan = q.build(spark, sf).queryExecution.analyzed
      val udfs = plan.flatMap(_.expressions.flatMap(_.collect {
        case u: ScalaUDF => u
      }))
      assert(udfs.isEmpty,
        s"${q.name} evaluates a codegen-opaque ScalaUDF: $udfs")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Queries whose cross/nested-loop join is BY DESIGN: declared tiny
  // cross join (q12), broadcast-small-side candidate generation (vector
  // search), or an explicitly bounded verify slice (q56).
  private val crossByDesign = Set("q12_cross_join", "q50_cosine_topk",
    "q51_knn_vote", "q56_ngram_jaccard", "q69_ivf_ann", "q77_fuzzy_match",
    "q15_self_join_banded", "q11_join_range", "q14_interval_join",
    "q143_hybrid_rrf", "q147_collocations", "q155_target_encoding",
    "q156_knn_calibration", "q161_benford_audit", "q162_reshard_audit")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.build(spark, sf)
      assert(df.count() > 0, s"${q.name} returned no rows")
      // plan guard: an unintended cartesian would pass tiny-SF value
      // checks and detonate at scale — catch it in-repo
      if (!crossByDesign(q.name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"${q.name}: unexpected CartesianProduct in plan")
      }
    }
  }
}
