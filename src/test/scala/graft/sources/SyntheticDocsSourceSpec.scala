package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpecBase

class SyntheticDocsSourceSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private def docs(rows: Long, parts: Int = 8) =
    spark.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly N deterministic rows across P partitions") {
    val df = docs(1000)
    assert(df.count() === 1000)
    assert(df.select("doc_id").distinct().count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    // bit-identical on re-read (pure function of doc_id)
    assert(docs(1000).orderBy("doc_id").collect().toSeq ===
      df.orderBy("doc_id").collect().toSeq)
  }

  test("doc_id range filters push into partition PLANNING, not row filtering") {
    val df = docs(1000000, parts = 16).filter($"doc_id" >= 999990L)
    // the scan plans only the surviving id range: 10 rows -> at most 10
    // single-row partitions, regardless of the million-row table size
    assert(df.rdd.getNumPartitions === 10)
    assert(df.count() === 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("range=[999990,1000000)"), p)
    assert(p.contains("PushedFilters") && p.contains("doc_id"), p)
    // the pushed predicate is fully consumed: no Filter node remains
    assert(!p.contains("Filter "), p)
  }

  test("column pruning reaches the reader (scan output excludes text)") {
    val df = docs(100).select($"doc_id", $"lang")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).get
    assert(scanLine.contains("doc_id") && !scanLine.contains("text"), scanLine)
    assert(df.distinct().count() === 100)
  }

  test("the generated corpus drives real operators (langid-style groupBy)") {
    val byLang = docs(500).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet === Set("en", "es", "zh", "de", "fr"))
    assert(byLang.values.sum === 500)
  }
}
