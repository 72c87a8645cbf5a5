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

  // ---- anchor helpers (r12: the wiring the r11 verdict flagged) ----

  private val shaA = "a" * 40
  private val shaB = "b" * 40
  private val shaC = "c" * 40

  test("pickRoundRef picks the newest round-close commit that is not HEAD") {
    val log = Seq(
      s"$shaA Close advice items",
      s"$shaB round 11: end-of-round snapshot (8 turns)",
      s"$shaC round 10: verdict/advice/correctness/bench")
    assert(Bench.pickRoundRef(log, "f" * 40) === Some(shaB))
  }

  test("pickRoundRef skips HEAD's own round commit (bench run after the " +
    "current round's close would otherwise self-compare, making " +
    "anchor_code_ratio a meaningless 1.0)") {
    val log = Seq(
      s"$shaB round 12: end-of-round snapshot",
      s"$shaC round 11: verdict/advice/correctness/bench")
    assert(Bench.pickRoundRef(log, shaB) === Some(shaC))
  }

  test("pickRoundRef returns None when history has no round commit " +
    "(fresh repo — anchor degrades to null, never crashes)") {
    assert(Bench.pickRoundRef(Seq(s"$shaA initial commit"), shaB) === None)
    assert(Bench.pickRoundRef(Nil, shaB) === None)
  }

  test("anchorTotals keeps only queries with evidence on every side " +
    "(old run, new run, positive history) and takes per-side minima") {
    val anchors = Seq("q1", "q2", "q3", "q4")
    val oldRuns = Seq(Map("q1" -> 2.0, "q2" -> 3.0, "q4" -> 1.0),
                      Map("q1" -> 1.5, "q2" -> -1.0))
    val newRuns = Seq(Map("q1" -> 1.8, "q2" -> 2.5, "q3" -> 0.5),
                      Map("q1" -> 2.2))
    val hist = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.4)
    // q1: all sides -> old min 1.5, new min 1.8, hist 1.0
    // q2: all sides (old's -1 excluded but 3.0 remains) -> 3.0/2.5/2.0
    // q3: no old evidence; q4: no new run, no history
    val (o, n, h, used) = Bench.anchorTotals(anchors, oldRuns, newRuns, hist)
    assert(used === 2)
    assert(o === 1.5 + 3.0)
    assert(n === 1.8 + 2.5)
    assert(h === 1.0 + 2.0)
  }

  test("anchorTotals excludes failed (-1) runs: a query whose only old " +
    "evidence is a failure contributes nothing") {
    val (o, n, h, used) = Bench.anchorTotals(Seq("q1"),
      Seq(Map("q1" -> -1.0)), Seq(Map("q1" -> 1.0)), Map("q1" -> 1.0))
    assert(used === 0 && o === 0.0 && n === 0.0 && h === 0.0)
  }

  test("anchorTotals on empty history yields n=0 (ratio must be null, " +
    "not divide-by-zero)") {
    val (_, _, _, used) = Bench.anchorTotals(Bench.anchorQueries,
      Seq(Map("q01_pricing_summary" -> 1.0)),
      Seq(Map("q01_pricing_summary" -> 1.0)), Map.empty)
    assert(used === 0)
  }

  test("addOpensFrom extracts both two-token and =-joined forms, deduped") {
    val args = Seq("-Xmx8g",
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens", "java.base/java.lang=ALL-UNNAMED",
      "-Dspark.ui.enabled=false")
    assert(Bench.addOpensFrom(args) === Seq(
      "java.base/java.lang=ALL-UNNAMED", "java.base/java.nio=ALL-UNNAMED"))
    assert(Bench.addOpensFrom(Seq("-Xmx1g")) === Nil)
  }

  test("jdk17AddOpensFallback parity with build.sbt: every package " +
    "build.sbt opens is in the fallback list (the anchor child JVM " +
    "bypasses sbt, so a silent divergence would crash it with " +
    "InaccessibleObjectException)") {
    val sbtTxt = Bench.readFs("build.sbt").getOrElse(
      fail("build.sbt not readable from test cwd"))
    val sbtPkgs = "\"(java\\.base/[a-zA-Z0-9.]+)\"".r
      .findAllMatchIn(sbtTxt).map(_.group(1)).toSeq.distinct
    assert(sbtPkgs.nonEmpty, "no java.base/ packages parsed from build.sbt")
    val missing = sbtPkgs.filterNot(Bench.jdk17AddOpensFallback.contains)
    assert(missing.isEmpty, s"build.sbt opens not in Bench fallback: $missing")
  }
}
