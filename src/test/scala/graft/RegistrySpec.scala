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
  private val singleRowQueries = Set("q17_global_agg", "q89_funnel")

  test("every oracle query ends with a deterministic ORDER BY") {
    SparkEntry.registry
      .filter(q => q.oracle.isDefined && !singleRowQueries(q.name))
      .foreach { q =>
        assert(q.oracle.get.toUpperCase.contains("ORDER BY"),
          s"${q.name}: oracle SQL lacks ORDER BY — hash compare would be order-dependent")
      }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.build(spark, sf)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }
}
