package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for Bench's quota-throttle evidence helpers (r7). These are
  * the parsers the requeue triggers and the sitting verdict depend on —
  * a silent parse failure would disable the defense without a trace, so
  * each degraded path must return its explicit "unknown" sentinel, never
  * throw and never fabricate a reading.
  */
class BenchHelpersSpec extends AnyFunSuite {

  private def tmp(content: String): String = {
    val f = Files.createTempFile("benchspec", ".json")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("loadHistory parses the compact detail format Bench itself writes") {
    val p = tmp("""{"metric":"total","queries_min":{"q01":1.234,"q10":-1.0,"q99":0.5},"sf":"x"}""")
    val h = Bench.loadHistory(p)
    assert(h === Map("q01" -> 1.234, "q10" -> -1.0, "q99" -> 0.5))
  }

  test("loadHistory tolerates whitespace around colons (hand-written or " +
    "pretty-printed history files)") {
    val p = tmp("""{ "queries_min" : { "q01" : 0.10 , "q10_join_anti" : 0.06 } }""")
    val h = Bench.loadHistory(p)
    assert(h === Map("q01" -> 0.10, "q10_join_anti" -> 0.06))
  }

  test("loadHistory returns empty (trigger disabled, not crashed) on a " +
    "missing file, malformed JSON, or a file without queries_min") {
    assert(Bench.loadHistory("/nonexistent/path.json") === Map.empty)
    assert(Bench.loadHistory(tmp("not json at all")) === Map.empty)
    assert(Bench.loadHistory(tmp("""{"queries":{"q01":1.0}}""")) === Map.empty)
  }

  test("loadHistory survives a mid-write-truncated history file (a prior " +
    "run killed during Files.write must not abort the next suite)") {
    assert(Bench.loadHistory(tmp("""{"queries_min":{"q01":1.2""")) === Map.empty)
    assert(Bench.loadHistory(tmp("""{"queries_min":{""")) === Map.empty)
  }

  test("correctedTotal substitutes clean requeue minima, keeps the better " +
    "number, rescues suite-failed queries, ignores non-requeued ones") {
    val base = Seq("q1" -> 10.0, "q2" -> 2.0, "q3" -> -1.0, "q4" -> 1.0)
    // q1 requeued clean at 1.5 (suite was inflated); q2 requeued SLOWER
    // (keep the suite 2.0); q3 failed in-suite, clean requeue rescues it
    val clean = Map("q1" -> 1.5, "q2" -> 3.0, "q3" -> 0.5)
    assert(Bench.correctedTotal(base, clean) === (1.5 + 2.0 + 0.5 + 1.0))
    // no clean evidence -> identical to the plain total (failed q3 excluded)
    assert(Bench.correctedTotal(base, Map.empty) === 13.0)
  }

  test("cgroup readers degrade to their unknown sentinels instead of " +
    "throwing when the files are absent") {
    // the machine may or may not run in a cgroup; both readers must
    // return either a real reading or the documented sentinel
    val lim = Bench.cgroupCpuLimit()
    assert(lim == -1.0 || lim > 0.0, s"cpu limit $lim")
    val (nr, us) = Bench.cgroupThrottle()
    assert(nr >= -1L && us >= -1L)
  }

  test("readFs returns None on unreadable paths and content otherwise") {
    assert(Bench.readFs("/nonexistent/abc").isEmpty)
    val p = tmp("hello")
    assert(Bench.readFs(p).contains("hello"))
  }
}
