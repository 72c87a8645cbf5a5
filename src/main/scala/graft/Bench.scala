package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE compact JSON line with BOTH measurement
  * protocols plus a machine-contention canary, and writes the full
  * per-query detail to a side file.
  *
  * WHY TWO OUTPUTS: the per-round driver keeps only the TAIL of this
  * process's stdout (the r1–r3 artifacts each hold a 2000-char tail
  * with `parsed: null` — a full 115-query × 4-map line is ~15 KB and
  * its opening brace fell outside the window every round, so no bench
  * was ever machine-parsed). The stdout line therefore carries the
  * totals, the canary, and only the HEADLINE queries (top
  * `SPARK_GRAFT_HEADLINE`, default 30, by first-run time) at 2-decimal
  * precision — and is AUTO-SHRUNK (fewer headline queries, then fewer
  * requeue entries) until it fits ~1.7 KB: at 292 registry queries the
  * r15 line outgrew the tail window and the driver shipped
  * `parsed: null` again (the r1–r3 failure recurring at a bigger
  * registry). Everything else moves to `SPARK_GRAFT_BENCH_DETAIL`
  * (default `BENCH_DETAIL.json` in the cwd — an UNTRACKED scratch
  * file). The committed per-round history stays `BENCH_FULL.json`,
  * which only a protocol-clean closing sitting is COPIED into by hand;
  * through r15 the two were ONE file, and twice running (r14, r15) the
  * driver's post-close re-bench overwrote the clean closing with a
  * drifted sitting minutes before the round-artifact commit —
  * splitting the write target from the committed history makes that
  * overwrite structurally impossible. `SPARK_GRAFT_BENCH_HISTORY`
  * (default `BENCH_FULL.json`) is where requeue/anchor history is
  * READ from. The detail file holds:
  *
  *   - `queries` / `value` — FIRST-run times (cold plan, the protocol
  *     the per-round driver has always recorded)
  *   - `queries_min` / `total_min` — min over `SPARK_GRAFT_REPEAT`
  *     (default 2) runs, cache cleared between runs (the BASELINE.md
  *     record protocol; cuts scheduler/GC noise out of A/B work)
  *   - `canary_before_sec` / `canary_after_sec` / `canary_drift` — a
  *     fixed single-threaded 10^8-step integer loop timed before and
  *     after the suite; on an idle machine drift ≈ 1.0, under external
  *     load it rises with the stolen cycles.
  *   - MID-RUN probe (r2/r4 lesson: two driver sittings were ~2.3x
  *     inflated by contention that started and ended INSIDE the suite,
  *     which a bracketing canary provably cannot see): a daemon thread
  *     samples every ~2 s, recording BOTH (a) the canary loop's
  *     slowdown vs the pre-suite baseline and (b) FOREIGN CPU load —
  *     system-wide load minus this JVM's own — via
  *     `com.sun.management.OperatingSystemMXBean`. (b) is the
  *     load-bearing signal: a competing Spark suite's parallel bursts
  *     are intermittent, so a sampled single-thread loop mostly
  *     schedules clean even at 2x thread oversubscription (measured:
  *     70%-inflated sitting, probe p95 1.17) — but its CPU seconds
  *     cannot hide from /proc. A sample is `slow` when FOREIGN load
  *     exceeds 0.2 of the machine — the canary ratio is deliberately
  *     NOT part of the verdict (it also counts our own GC pauses and
  *     self-oversubscription, so long solo sittings would false-
  *     positive; it ships as a diagnostic only). `mid_contended` trips
  *     at >= 3 slow samples (a lone one is a stray cron tick, not a
  *     sitting-invalidating event).
  *     The detail file adds per-query `probe_max_ratio` /
  *     `foreign_max` and the `probe_contended` list of queries whose
  *     window overlapped a slow sample. `contended: true` when drift
  *     > 1.5 OR mid_contended — treat every number in that sitting as
  *     suspect. Self-noise guard: our own GC/compile threads count as
  *     THIS process, so foreign load stays ~0 on a solo sitting.
  *   - `shuffle_mb` / `spill_mb` (detail file) — per-query shuffle
  *     write volume and spill bytes (task-metrics totals over the
  *     repeats, averaged per run). Wall-clock says how long a query
  *     took HERE; shuffle bytes say what it would cost on a real
  *     network — the number that actually extrapolates to 100 TB.
  *     Listener delivery is async, so a query's tail bytes can land on
  *     its successor; treat ±a few MB as attribution noise.
  *
  *   - QUOTA-THROTTLE defense (r6 lesson: the driver sitting showed
  *     probe starvation ratios up to 108 with foreign load 0.0 —
  *     cgroup CPU quota, invisible to any /proc load probe, and the
  *     foreign-load-keyed requeue never fired): the harness now reads
  *     the cgroup directly — `cpu.max` (effective CPU limit →
  *     `cgroup_cpus`) and `cpu.stat` throttle counters at start/end
  *     and AROUND EVERY QUERY (`throttled_usec_by_query`,
  *     `nr_throttled_delta`, `throttled_usec_delta`) — and times a
  *     full-width PARALLEL canary (all `local[N]` threads at once)
  *     before and after the suite. A single sampled thread mostly
  *     schedules clean under capacity theft; a batch that demands all
  *     N cores at once cannot hide it (`pcanary_ratio_*` ≈ 1 healthy,
  *     ≈ N/quota under a quota). Requeue now ALSO trips with zero
  *     foreign load on any of: probe starved >3× in a query's window,
  *     fresh min >3× the committed history (`BENCH_FULL.json` at HEAD,
  *     read before overwrite), or >100 ms kernel-reported throttling
  *     in the window. Per-entry `clean` requires at least one real
  *     probe sample (plus a synchronous reading for sub-period runs)
  *     AND no in-window throttling — never a default from an empty
  *     sample set.
  *
  * All numbers are formatted with Locale.ROOT — the JVM default locale
  * must never decide whether the emitted line is valid JSON (a
  * comma-decimal locale would print `"q01":1,23`).
  */
object Bench {

  /** Deterministic CPU-bound loop (xorshift accumulate). The result is
    * returned and folded into an ignored JSON field so the JIT cannot
    * eliminate the loop. */
  private def canaryWork(): Long = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < 100000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    acc
  }

  private def timeCanary(): (Double, Long) = {
    val t0 = System.nanoTime()
    val acc = canaryWork()
    ((System.nanoTime() - t0) / 1e9, acc)
  }

  /** Parallel-capacity canary (r6 verdict item 8): `threads` copies of
    * the scalar loop run concurrently and we time the WALL clock of the
    * whole batch. On a machine that really has `threads` cores the wall
    * is ~the scalar time; under a cgroup cpu quota of Q cores it is
    * ~threads/Q × scalar. The r5/r6 driver sittings proved that
    * parallel-capacity theft (quota throttling, sibling suites) is
    * invisible to a sampled single-thread loop — it mostly schedules
    * clean even at 2× oversubscription — so the sitting-level verdict
    * needs a probe that actually DEMANDS all the cores at once. Runs
    * once before and once after the suite (not sampled mid-run: a 32-
    * thread burst inside the suite would contend with our own queries
    * and poison the numbers it is guarding). */
  private def timeParallelCanary(threads: Int): (Double, Long) = {
    val acc = new AtomicLong(0L)
    val ts = (1 to threads).map { _ =>
      new Thread(() => { acc.addAndGet(canaryWork()): Unit })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, acc.get())
  }

  private[graft] def readFs(p: String): Option[String] =
    try Some(new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8))
    catch { case _: Throwable => None }

  /** Effective CPU limit from the cgroup (v2 `cpu.max`, v1
    * `cpu.cfs_quota_us`/`cpu.cfs_period_us`); -1.0 = unlimited or
    * unreadable. The r6 driver sitting showed per-query probe-starvation
    * ratios up to 108 with ZERO foreign /proc load — the signature of a
    * quota, which no load probe can see. Reading the quota directly
    * either proves or clears that hypothesis in one field. */
  private[graft] def cgroupCpuLimit(): Double = {
    val v2 = readFs("/sys/fs/cgroup/cpu.max").map(_.trim.split("\\s+")).collect {
      case Array(q, p) if q != "max" && p.toDouble > 0 => q.toDouble / p.toDouble
    }
    def v1 = for {
      q <- readFs("/sys/fs/cgroup/cpu/cpu.cfs_quota_us").map(_.trim.toDouble) if q > 0
      p <- readFs("/sys/fs/cgroup/cpu/cpu.cfs_period_us").map(_.trim.toDouble) if p > 0
    } yield q / p
    v2.orElse(v1).getOrElse(-1.0)
  }

  /** (nr_throttled, throttled_usec) from cgroup cpu.stat; (-1,-1) if
    * unreadable. Deltas across a window tell whether the kernel paused
    * our runnable threads during it — the direct evidence for (or
    * against) the quota-throttling read of an inflated query. */
  private[graft] def cgroupThrottle(): (Long, Long) = {
    val txt = readFs("/sys/fs/cgroup/cpu.stat")
      .orElse(readFs("/sys/fs/cgroup/cpu/cpu.stat"))
    txt.map { s =>
      val m = s.linesIterator.map(_.trim.split("\\s+")).collect {
        case Array(k, v) => k -> v.toLong
      }.toMap
      (m.getOrElse("nr_throttled", -1L),
       m.getOrElse("throttled_usec", m.getOrElse("throttled_time", -1L) match {
         case -1L => -1L
         case ns  => ns / 1000  // v1 reports nanoseconds
       }))
    }.getOrElse((-1L, -1L))
  }

  /** Committed per-query min-times from a previous detail file (the
    * repo's BENCH_FULL.json at HEAD, read BEFORE this run overwrites
    * it). A query whose fresh min exceeds ~3× its committed history is
    * a requeue suspect even when every load probe reads clean — the
    * q10-anti case from the r6 driver sitting: a trivial unchanged
    * query 20× inflated with foreign load 0.0. */
  /** A total with each CLEAN requeue minimum substituted for its
    * suite-run number (and used outright when the suite run failed,
    * base < 0). No clean evidence → no substitution; queries still
    * negative after substitution are excluded, mirroring the plain
    * totals. Pinned in BenchHelpersSpec. */
  private[graft] def correctedTotal(base: Seq[(String, Double)],
                                    clean: Map[String, Double]): Double =
    base.map { case (k, v) =>
      clean.get(k) match {
        case Some(r) if v < 0 => r
        case Some(r)          => v min r
        case None             => v
      }
    }.filter(_ >= 0).sum

  private[graft] def loadHistory(path: String): Map[String, Double] =
    try {
      readFs(path).flatMap { txt =>
        "\"queries_min\"\\s*:\\s*\\{".r.findFirstMatchIn(txt).flatMap { m =>
          // a run killed mid-write can truncate the file before the
          // closing brace — degrade to "no history", never abort the
          // suite over its own prior crash
          val close = txt.indexOf('}', m.end)
          if (close < 0) None
          else Some("\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+)".r
            .findAllMatchIn(txt.substring(m.end, close))
            .map(g => g.group(1) -> g.group(2).toDouble).toMap)
        }
      }.getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }

  // ---- cross-sitting anchor (r9→r12 verdict item 1) ----
  // Round-over-round totals were argued clean post-hoc three rounds
  // running (r8 contention, r9 page-cache 1.20×, r10 a flagged-suspect
  // sitting). The anchor makes that exculpation mechanical: re-run a
  // PINNED 5-query set with the PREVIOUS round's committed code, in THIS
  // sitting, interleaved JVM-by-JVM with the same set on the current
  // build, and emit
  //   anchor_ratio      = old-code-now / old-code-then (committed
  //                       BENCH_FULL.json history) — same code both
  //                       sides, so the ratio is pure environment drift;
  //                       divide any cross-sitting comparison by it.
  //   anchor_code_ratio = new-code-now / old-code-now — the same-sitting
  //                       A/B of this round's code changes on the anchor
  //                       set (≈1.0 unless an anchor query's path changed).
  // The anchor runs AFTER the suite (and after any requeue) so its
  // worktree build and extra JVMs never overlap a measured query;
  // mid-suite contention is separately covered by the probe/requeue
  // machinery above. `runAnchor` wires it into `main`; the protocol is
  // recorded in BASELINE.md §anchor. SPARK_GRAFT_ANCHOR=0 disables it,
  // and it is force-disabled in child JVMs (SPARK_GRAFT_ONLY set) so an
  // anchor child can never recurse into building its own worktree.

  /** Pinned anchor set: long-lived, deterministic-cost, mid-weight
    * (0.5–3 s at sf0.1), spanning scan+agg, window, text, banded
    * self-join, and broadcast-decontamination paths. Changing this set
    * breaks cross-round comparability — append a dated note to
    * BASELINE.md if it ever has to change. */
  private[graft] val anchorQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q25_ranking", "q44_tfidf_topk",
    "q54_minhash_lsh", "q93_decontaminate")

  /** Newest `git log --format="%H %s"` line whose subject is a driver
    * round-close commit ("round N: …") and whose sha is NOT `headSha`
    * → its sha. The HEAD exclusion matters when the bench runs after
    * the current round's own close/snapshot commit: without it the
    * anchor would compare the current code against itself and
    * anchor_code_ratio would be a meaningless 1.0 by construction.
    * Pinned in BenchHelpersSpec. */
  private[graft] def pickRoundRef(logLines: Seq[String], headSha: String): Option[String] =
    logLines.collectFirst {
      case l if l.matches("[0-9a-f]{7,40}\\s+round \\d+:.*") &&
        !l.startsWith(headSha.trim) =>
        l.split("\\s+")(0)
    }

  /** Anchor totals over the queries with evidence on EVERY side: at
    * least one non-failed old-JVM run, at least one non-failed new-run,
    * and a positive committed-history entry. Returns (oldSec, newSec,
    * histSec, nUsed). Pinned in BenchHelpersSpec. */
  private[graft] def anchorTotals(anchors: Seq[String],
      oldRuns: Seq[Map[String, Double]], newRuns: Seq[Map[String, Double]],
      hist: Map[String, Double]): (Double, Double, Double, Int) = {
    def mins(ms: Seq[Map[String, Double]], n: String): Seq[Double] =
      ms.flatMap(_.get(n)).filter(_ >= 0)
    val ok = anchors.filter { n =>
      mins(oldRuns, n).nonEmpty && mins(newRuns, n).nonEmpty &&
        hist.get(n).exists(_ > 0)
    }
    (ok.map(n => mins(oldRuns, n).min).sum,
     ok.map(n => mins(newRuns, n).min).sum,
     ok.map(hist).sum, ok.size)
  }

  /** Run `cmd`, drain stdout+stderr, enforce a wall timeout. Returns
    * (exitCode, output); exit -1 on timeout (process force-killed). The
    * drain thread is joined on BOTH exits — a kill without the join
    * could return a buffer truncated mid-write. */
  private def exec(cmd: Seq[String], cwd: Option[java.io.File],
      extraEnv: Map[String, String], timeoutSec: Long): (Int, String) = {
    import scala.jdk.CollectionConverters._
    val pb = new ProcessBuilder(cmd.asJava)
    cwd.foreach(d => pb.directory(d): Unit)
    pb.redirectErrorStream(true)
    val e = pb.environment()
    extraEnv.foreach { case (k, v) => e.put(k, v) }
    val p = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => { p.getInputStream.transferTo(out): Unit },
      "bench-anchor-drain")
    drain.setDaemon(true); drain.start()
    val code =
      if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly().waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
        -1
      } else p.exitValue()
    drain.join(2000)
    (code, new String(out.toByteArray, StandardCharsets.UTF_8))
  }

  /** JDK17 `--add-opens` package list Spark needs when SparkSession is
    * created outside spark-submit. Fallback only: `childJavaOpts`
    * prefers the opens of the RUNNING JVM (which sbt forked with
    * build.sbt's javaOptions), so a build.sbt edit propagates to the
    * anchor children automatically; this static list covers the
    * unforked case (e.g. the helpers exercised from a plain JUnit JVM).
    * A BenchHelpersSpec parity test pins it against build.sbt's list. */
  private[graft] val jdk17AddOpensFallback: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  )

  /** `--add-opens` values present in a JVM argument list — both the
    * two-token (`--add-opens p=m`) and `=`-joined single-token forms.
    * Pinned in BenchHelpersSpec. */
  private[graft] def addOpensFrom(jvmArgs: Seq[String]): Seq[String] = {
    val paired = jvmArgs.sliding(2).collect {
      case Seq("--add-opens", v) => v
    }.toSeq
    val joined = jvmArgs.collect {
      case a if a.startsWith("--add-opens=") => a.stripPrefix("--add-opens=")
    }
    (paired ++ joined).distinct
  }

  /** JVM options for an anchor child: the running JVM's own --add-opens
    * (falling back to the static JDK17 list), UTC, no UI, and the same
    * heap cap build.sbt gives the bench itself. */
  private def childJavaOpts(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val own = addOpensFrom(
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq)
    val opens =
      (if (own.nonEmpty) own else jdk17AddOpensFallback.map(_ + "=ALL-UNNAMED"))
        .flatMap(p => Seq("--add-opens", p))
    opens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")
  }

  /** Build the previous-round tree at `ref` into a cached worktree under
    * target/ and return its classes dir; None when checkout or compile
    * fails (the anchor then degrades to null, never aborts the bench).
    * The worktree is keyed by a marker file holding the built sha, so a
    * re-bench of the same round skips the ~2-min sbt compile. */
  private def buildRef(ref: String): Option[java.io.File] = {
    val wt = new java.io.File("target/anchor-wt")
    val marker = new java.io.File(wt, ".anchor-sha")
    val classes = new java.io.File(wt, "target/scala-2.13/classes")
    val cached = marker.exists() &&
      readFs(marker.getPath).exists(_.trim == ref) &&
      new java.io.File(classes, "graft/Bench.class").exists()
    if (cached) return Some(classes)
    if (wt.exists()) {
      exec(Seq("git", "worktree", "remove", "--force", wt.getPath), None,
        Map.empty, 60)
      // a half-removed dir blocks `worktree add`; best-effort delete
      if (wt.exists()) exec(Seq("rm", "-rf", wt.getPath), None, Map.empty, 60)
    }
    val (addCode, addOut) = exec(
      Seq("git", "worktree", "add", "--force", "--detach", wt.getPath, ref),
      None, Map.empty, 120)
    if (addCode != 0) {
      System.err.println(s"[bench] anchor: worktree add failed: ${addOut.take(300)}")
      return None
    }
    val (bCode, bOut) = exec(Seq("sbt", "-batch", "compile"), Some(wt),
      Map.empty, 1200)
    if (bCode != 0 || !new java.io.File(classes, "graft/Bench.class").exists()) {
      System.err.println(s"[bench] anchor: old-ref compile failed (exit $bCode): " +
        bOut.linesIterator.toSeq.takeRight(5).mkString(" | "))
      return None
    }
    Files.write(marker.toPath, ref.getBytes(StandardCharsets.UTF_8))
    Some(classes)
  }

  /** One anchor child JVM: run graft.Bench restricted to the anchor set
    * against `classesDir`, return its per-query min times (empty on any
    * failure). Child env disables recursion (ANCHOR=0), requeues, and
    * history triggers; repeat=2 inside the child matches the
    * queries_min protocol of the committed history it is compared to. */
  private def runAnchorChild(classesDir: java.io.File, sfDir: String,
      cpus: String): Map[String, Double] = {
    val detail = Files.createTempFile("anchor-detail", ".json")
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
      val cp = classesDir.getPath + java.io.File.pathSeparator + "/opt/spark/jars/*"
      val cmd = Seq(javaBin) ++ childJavaOpts() ++ Seq("-cp", cp, "graft.Bench")
      val env = Map(
        "SPARK_GRAFT_ONLY" -> anchorQueries.mkString(","),
        "SPARK_GRAFT_REPEAT" -> "2",
        "SPARK_GRAFT_REQUEUE" -> "0",
        "SPARK_GRAFT_ANCHOR" -> "0",
        "SPARK_GRAFT_SF_DIR" -> sfDir,
        "SPARK_GRAFT_CPUS" -> cpus,
        "SPARK_GRAFT_HEADLINE" -> "5",
        "SPARK_GRAFT_BENCH_DETAIL" -> detail.toString,
        "SPARK_GRAFT_BENCH_HISTORY" -> "/nonexistent-anchor-no-history")
      val (code, out) = exec(cmd, None, env, 600)
      if (code != 0) {
        System.err.println(s"[bench] anchor child exit $code: " +
          out.linesIterator.toSeq.takeRight(3).mkString(" | "))
        Map.empty
      } else loadHistory(detail.toString)
    } finally { Files.deleteIfExists(detail): Unit }
  }

  /** Post-suite anchor driver: previous round ref → worktree build →
    * 2×2 interleaved old/new child JVMs → (detailFragment,
    * stdoutFragment). Fragments are leading-comma JSON; ratios are JSON
    * null whenever any leg lacks evidence. */
  private def runAnchor(sfDir: String, cpus: String,
      histMin: Map[String, Double]): (String, String) = {
    def out(ratio: Option[Double], codeRatio: Option[Double], n: Int,
        oldSec: Double, newSec: Double, histSec: Double, ref: String,
        note: String): (String, String) = {
      def opt(v: Option[Double]) = v.map(f3).getOrElse("null")
      val head = s""","anchor_ratio":${opt(ratio)}""" +
        s""","anchor_code_ratio":${opt(codeRatio)},"anchor_n":$n"""
      val det = head +
        s""","anchor":{"old_sec":${f3(oldSec)},"new_sec":${f3(newSec)}""" +
        s""","hist_sec":${f3(histSec)},"ref":"$ref","note":"$note"""" +
        s""","queries":${anchorQueries.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
      (det, head)
    }
    def skip(note: String) = {
      System.err.println(s"[bench] anchor skipped: $note")
      out(None, None, 0, -1, -1, -1, "", note)
    }
    try {
      val (hc, headSha) = exec(Seq("git", "rev-parse", "HEAD"), None, Map.empty, 30)
      val (lc, logTxt) = exec(Seq("git", "log", "--format=%H %s", "-100"),
        None, Map.empty, 30)
      if (hc != 0 || lc != 0) return skip("git unavailable")
      pickRoundRef(logTxt.linesIterator.toSeq, headSha.trim) match {
        case None => skip("no previous round commit in history")
        case Some(ref) =>
          buildRef(ref) match {
            case None => skip(s"build of $ref failed")
            case Some(oldClasses) =>
              val newClasses = new java.io.File("target/scala-2.13/classes")
              // interleaved old/new so slow environment drift hits both
              // sides symmetrically within the sitting
              val oldRuns = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
              val newRuns = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
              (1 to 2).foreach { _ =>
                oldRuns += runAnchorChild(oldClasses, sfDir, cpus)
                newRuns += runAnchorChild(newClasses, sfDir, cpus)
              }
              val (oldSec, newSec, histSec, n) =
                anchorTotals(anchorQueries, oldRuns.toSeq, newRuns.toSeq, histMin)
              if (n == 0)
                out(None, None, 0, oldSec, newSec, histSec, ref.take(7),
                  "no query with evidence on all sides")
              else
                out(Some(oldSec / histSec), Some(newSec / oldSec), n,
                  oldSec, newSec, histSec, ref.take(7), "ok")
          }
      }
    } catch {
      case e: Throwable => skip(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** The q111/q113/q125/q128 summaries run intentionally-unpartitioned
    * windows over <=31-row bucket/source/spine frames — correct at any
    * scale, but WindowExec logs a per-task warning that ate a third of
    * the r4 driver's 2000-char stdout tail. A constant partition key
    * can't silence it (Catalyst folds foldable partition expressions
    * away, verified), so the harness mains drop that one logger to
    * ERROR; library users still see the warning on genuinely skewed
    * windows of their own. */
  def silenceKnownBenignWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Locale-pinned fixed-point formatting — JSON-valid on any JVM. */
  private def f2(v: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(v))
  private def f3(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the machine, not a constant: the canonical env is
    // local[32]/128 GiB, and an unset var silently benching at
    // local[4] would overstate every CPU-parallel query ~8×.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Tables' TIMESTAMP_NTZ normalization (and every ts-keyed query)
      // assumes the session tz Verify pins; a non-UTC JVM default here
      // would bench DIFFERENT work than the oracle verified
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceKnownBenignWarnings()
    // JIT-warm the canary loop so `before` measures the machine, not
    // the interpreter; then take the pre-suite readings: scalar first
    // (the parallel one reuses the already-hot loop), then parallel.
    canaryWork(); canaryWork()
    val (canaryBefore, sink0) = timeCanary()
    val pcanaryThreads = cpus.toInt max 2
    val (pcanaryBefore, psink0) = timeParallelCanary(pcanaryThreads)
    val cgroupCpus = cgroupCpuLimit()
    val (thrN0, thrUs0) = cgroupThrottle()
    // Detail WRITES go to an untracked scratch file; history READS come
    // from the committed clean closing (BENCH_FULL.json) — split paths,
    // see the object scaladoc for the two-round overwrite story.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val histPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_FULL.json")
    val histMin = loadHistory(histPath)
    // Warm the JVM/codegen/shuffle paths once, untimed, so the first
    // measured query doesn't absorb cluster start-up cost. A FAILED
    // warm-up means every number below is silently cold — say so.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARM-UP FAILED (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}) — all times below include JVM/codegen start-up")
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt max 1
    // Mid-run contention probe: (endNanos, canarySec, foreignLoad) ~2 s.
    val probes = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Double)]
    val probeSink = new AtomicLong(0L)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // prime the /proc tick counters so the first real read has a window
    osBean.getCpuLoad(); osBean.getProcessCpuLoad()
    @volatile var probeOn = true
    val probeThread = new Thread(() => {
      while (probeOn) {
        val (sec, acc) = timeCanary()
        val sys = osBean.getCpuLoad()
        val self = osBean.getProcessCpuLoad()
        val foreign =
          if (sys.isNaN || self.isNaN || sys < 0 || self < 0) 0.0
          else math.max(0.0, sys - self)
        probeSink.addAndGet(acc): Unit
        probes.add((System.nanoTime(), sec, foreign)): Unit
        Thread.sleep(2000)
      }
    }, "bench-contention-probe")
    probeThread.setDaemon(true)
    probeThread.start()
    val shuffleBytes = new AtomicLong(0L)
    val spillBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
        }
      }
    })
    // per query: start/end nanos of its measurement window, for probe overlap
    val windows = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    // per query: throttled_usec delta across its window (cgroup cpu.stat)
    val throttledUs = scala.collection.mutable.LinkedHashMap[String, Long]()
    // per query: (first s, min-of-N s, shuffle MB/run, spill MB/run); -1 = failed
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val qStart = System.nanoTime()
        val qThr0 = cgroupThrottle()._2
        val (sh0, sp0) = (shuffleBytes.get(), spillBytes.get())
        val times = (1 to repeat).flatMap { _ =>
          // Operators that persist() intermediates register plans in the
          // CacheManager; drop them so every repeat measures real work.
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          // a failed repeat contributes NO time — min over elapsed-to-
          // failure would report a fast crash as a fast query.
          // Consume through the noop sink, NOT count(): count lets the
          // optimizer prune every column the cardinality doesn't need,
          // so a projection-heavy query (per-row fingerprints,
          // quantization) would be timed with its defining work
          // optimized away entirely.
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}")
              None
          }
        }
        val runs = times.size max 1
        val shuffleMb = (shuffleBytes.get() - sh0) / 1e6 / runs
        val spillMb = (spillBytes.get() - sp0) / 1e6 / runs
        windows(name) = (qStart, System.nanoTime())
        val qThr1 = cgroupThrottle()._2
        throttledUs(name) = if (qThr0 >= 0 && qThr1 >= 0) qThr1 - qThr0 else -1L
        name -> (times.headOption.getOrElse(-1.0),
                 if (times.nonEmpty) times.min else -1.0,
                 shuffleMb, spillMb)
      }
    probeOn = false
    val (canaryAfter, sink1) = timeCanary()
    val (pcanaryAfter, psink1) = timeParallelCanary(pcanaryThreads)
    val (thrN1, thrUs1) = cgroupThrottle()
    val thrNDelta = if (thrN0 >= 0 && thrN1 >= 0) thrN1 - thrN0 else -1L
    val thrUsDelta = if (thrUs0 >= 0 && thrUs1 >= 0) thrUs1 - thrUs0 else -1L
    val drift = canaryAfter / canaryBefore
    // Probe verdicts: canary ratio vs pre-suite baseline + foreign load.
    val samples = {
      import scala.jdk.CollectionConverters._
      probes.asScala.toVector
        .map { case (t, s, f) => (t, s / canaryBefore, f) }
    }
    // The CONTENTION verdict keys on foreign load alone: the canary
    // ratio also counts our own GC pauses and self-oversubscription, so
    // on a long solo sitting >= 3 ratio-slow samples is expected noise,
    // not evidence (self-review r5). Ratios stay in the artifact as
    // diagnostics (probe_p95 / probe_max_ratio).
    def isSlow(r: Double, f: Double): Boolean = f > 0.2
    val slowProbes = samples.filter { case (_, r, f) => isSlow(r, f) }
    val midContended = slowProbes.size >= 3
    val probeP95 =
      if (samples.isEmpty) 0.0
      else samples.map(_._2).sorted.apply(((samples.size - 1) * 95) / 100)
    val foreignMax = samples.map(_._3).foldLeft(0.0)(_ max _)
    def within(w: (Long, Long)) =
      samples.filter { case (t, _, _) => t >= w._1 && t <= w._2 }
    def probeMaxIn(w: (Long, Long)): Double =
      within(w).map(_._2).foldLeft(0.0)(_ max _)
    def foreignMaxIn(w: (Long, Long)): Double =
      within(w).map(_._3).foldLeft(0.0)(_ max _)
    val probeContended = windows.collect {
      case (name, w) if within(w).exists { case (_, r, f) => isSlow(r, f) } => name
    }.toSeq
    // ---- quota-throttle detection (r6 verdict item 1). The foreign-load
    // gate above is structurally blind to cgroup CPU quotas: the r6
    // driver sitting hit per-query probe-starvation ratios up to 108
    // with foreign load 0.0 and `requeued` shipped empty. Three
    // triggers that need NO foreign load:
    //   (a) probe loop starved >3× inside a query's window while
    //       foreign stayed low — something /proc can't see stole CPU;
    //   (b) fresh min > 3× the committed history for that query
    //       (50 ms floor so trivial-query noise can't trip it) — the
    //       q10-anti case: an unchanged trivial query 20× inflated;
    //   (c) the cgroup itself reported >100 ms throttled time inside
    //       the query's window — direct kernel evidence.
    val throttleSuspects = windows.collect {
      case (n, w) if probeMaxIn(w) > 3.0 && foreignMaxIn(w) < 0.2 => n
    }.toSeq
    val histSuspects = results.collect {
      case (n, v) if histMin.get(n).exists(h => h > 0.05 && v._2 > 3.0 * h) => n
    }
    val cgroupSuspects = throttledUs.collect {
      case (n, us) if us > 100000L => n
    }.toSeq
    // Sitting-level capacity verdict: a full-width parallel canary that
    // takes >3× the scalar time means ≥2/3 of the claimed capacity was
    // absent at that instant — quota or siblings, either way the
    // parallel queries in this sitting are suspect. The verdict needs a
    // capacity witness so deliberate self-oversubscription (cpus=32 on
    // an honest 4-core box with no quota evidence) doesn't false-flag:
    // EITHER availableProcessors covers the thread count, OR the cgroup
    // itself declares a quota below it — the container-aware-JVM case
    // where availableProcessors ALREADY reflects the quota and would
    // otherwise disable the exact detection this canary exists for.
    val availProcs = Runtime.getRuntime.availableProcessors
    val pratioBefore = pcanaryBefore / canaryBefore
    val pratioAfter = pcanaryAfter / canaryAfter
    val capacityWitness = availProcs >= pcanaryThreads ||
      (cgroupCpus > 0 && cgroupCpus < pcanaryThreads)
    val capacityStarved = capacityWitness &&
      (pratioBefore > 3.0 || pratioAfter > 3.0)
    val throttledSitting = thrUsDelta > 1000000L || capacityStarved
    val contended = drift > 1.5 || midContended || throttledSitting
    // ---- self-defending requeue (r5 verdict item): a contended sitting
    // re-runs its top suspects AFTER the suite, each with a fresh
    // foreign-load probe, so even a contaminated driver sitting carries
    // usable per-query evidence — the judge re-ran six queries by hand
    // in r5; this automates that exact move. Suspects = queries whose
    // measurement window overlapped a slow sample (fallback: all),
    // ranked by their own cost; each requeued number ships with the
    // foreign load observed DURING its re-run, so "clean" is a per-entry
    // fact, not a sitting-wide hope.
    val requeueN = sys.env.getOrElse("SPARK_GRAFT_REQUEUE", "10").toInt
    val requeueTrip = contended || throttleSuspects.nonEmpty ||
      histSuspects.nonEmpty || cgroupSuspects.nonEmpty
    // (name, min, foreignMax, runs, inWindowSamples, throttledUsec, histSec)
    val requeued: Seq[(String, Double, Double, Int, Int, Long, Double)] =
      if (!requeueTrip || requeueN <= 0) Nil
      else {
        System.err.println(s"[bench] sitting suspect (drift=${f3(drift)}, " +
          s"slow_probes=${slowProbes.size}, throttle_suspects=${throttleSuspects.size}, " +
          s"hist_suspects=${histSuspects.size}, cgroup_suspects=${cgroupSuspects.size}) " +
          "— requeueing top suspects")
        val byCost = results.toMap
        val suspectPool =
          (probeContended ++ throttleSuspects ++ histSuspects ++ cgroupSuspects).distinct
        val pool = if (suspectPool.nonEmpty) suspectPool else results.map(_._1)
        val suspects = pool.sortBy(n => -(byCost(n)._1 max byCost(n)._2)).take(requeueN)
        // Foreign-load-only probe at 500 ms so even ~1 s queries get a
        // sample; the canary loop adds nothing here (foreign load is the
        // load-bearing signal — see the verdict note above).
        val rqProbes = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]
        @volatile var rqOn = true
        val rqThread = new Thread(() => {
          while (rqOn) {
            val sys = osBean.getCpuLoad()
            val self = osBean.getProcessCpuLoad()
            val foreign =
              if (sys.isNaN || self.isNaN || sys < 0 || self < 0) 0.0
              else math.max(0.0, sys - self)
            rqProbes.add((System.nanoTime(), foreign)): Unit
            Thread.sleep(500)
          }
        }, "bench-requeue-probe")
        rqThread.setDaemon(true)
        rqThread.start()
        val out = suspects.map { name =>
          val w0 = System.nanoTime()
          val rqThr0 = cgroupThrottle()._2
          val times = (1 to (repeat max 2)).flatMap { _ =>
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            try {
              SparkEntry.queries(name)(spark, sfDir)
                .write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] requeue $name FAILED: ${e.getClass.getSimpleName}")
                None
            }
          }
          val w1 = System.nanoTime()
          val rqThr1 = cgroupThrottle()._2
          // One synchronous reading right after the window joins the
          // sampled ones: the MXBean's load covers its recent tick
          // delta, so even a sub-500 ms re-run (shorter than the probe
          // period) carries at least one real foreign-load observation
          // instead of certifying itself clean on an empty sample set.
          // A NaN/negative MXBean result is NOT a sample — fabricating
          // 0.0 would be exactly the evidence-free default `clean` this
          // block exists to prevent.
          val syncF: Option[Double] = {
            val sysL = osBean.getCpuLoad(); val selfL = osBean.getProcessCpuLoad()
            if (sysL.isNaN || selfL.isNaN || sysL < 0 || selfL < 0) None
            else Some(math.max(0.0, sysL - selfL))
          }
          val inWin = {
            import scala.jdk.CollectionConverters._
            rqProbes.asScala.toVector
              .collect { case (t, f) if t >= w0 && t <= w1 => f }
          } ++ syncF
          val fmax = inWin.foldLeft(0.0)(_ max _)
          val thrUs = if (rqThr0 >= 0 && rqThr1 >= 0) rqThr1 - rqThr0 else -1L
          (name, if (times.nonEmpty) times.min else -1.0, fmax, times.size,
           inWin.size, thrUs, histMin.getOrElse(name, -1.0))
        }
        rqOn = false
        out
      }
    // Per-entry `clean` is a POSITIVE verdict, never a default: it
    // requires at least one probe sample actually landed inside the
    // re-run window (a fast re-run with zero samples used to certify
    // itself clean on fmax's 0.0 initial — the opposite of per-entry
    // evidence), low observed foreign load, and no kernel-reported
    // throttling during the window. `hist_sec` ships alongside so a
    // still-3×-history re-run reads as a regression signal, not hidden.
    val requeuedEntries = requeued
      .map { case (k, sec, fmax, runs, nSamp, thrUs, hist) =>
        val clean = runs > 0 && nSamp > 0 && fmax <= 0.2 &&
          (thrUs < 0 || thrUs <= 100000L)
        (k, sec, fmax, runs, nSamp, thrUs, hist, clean)
      }
    val requeuedJson = requeuedEntries
      .map { case (k, sec, fmax, runs, nSamp, thrUs, hist, clean) =>
        "\"" + k + "\":{\"min_sec\":" + f3(sec) + ",\"foreign_max\":" + f2(fmax) +
          ",\"runs\":" + runs + ",\"samples\":" + nSamp +
          ",\"thr_usec\":" + thrUs + ",\"hist_sec\":" + f3(hist) +
          ",\"clean\":" + clean + "}"
      }.mkString("{", ",", "}")
    // stdout gets a compact [min_sec, clean] form — the full per-entry
    // evidence lives in the detail file; the stdout line must stay
    // inside the driver's 2000-char tail window (see object scaladoc).
    def requeuedCompact(take: Int): String = requeuedEntries.take(take)
      .map { case (k, sec, _, _, _, _, _, clean) =>
        "\"" + k + "\":[" + f2(sec) + "," + (if (clean) 1 else 0) + "]"
      }.mkString("{", ",", "}")
    // ---- cross-sitting anchor: last, so its child JVMs and worktree
    // build never overlap a measured query or a requeue re-run. Child
    // mode (SPARK_GRAFT_ONLY set) force-disables it — the anchor spawns
    // Bench children with ONLY set, so this is the recursion guard.
    val anchorOn = sys.env.getOrElse("SPARK_GRAFT_ANCHOR", "1") != "0" &&
      only.isEmpty
    val (anchorDetailJson, anchorHeadJson) =
      if (anchorOn) runAnchor(sfDir, cpus, histMin) else ("", "")
    def jmap(sel: ((Double, Double, Double, Double)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f3(sel(v)) }.mkString("{", ",", "}")
    val totalFirst = results.map(_._2._1).filter(_ >= 0).sum
    val totalMin = results.map(_._2._2).filter(_ >= 0).sum
    // Self-interpreting headline (r8 verdict item 6): totals with each
    // CLEAN requeue minimum substituted for its (environment-inflated)
    // suite-run number — the r8 sitting read 20 s worse than reality
    // until a human cross-referenced the `requeued` block by hand. A
    // non-clean requeue substitutes nothing (no evidence, no credit);
    // with no requeue the corrected totals equal the plain ones.
    val cleanRq: Map[String, Double] = requeuedEntries
      .collect { case (k, sec, _, _, _, _, _, true) if sec >= 0 => k -> sec }
      .toMap
    val totalCorrected =
      correctedTotal(results.map { case (k, v) => k -> v._1 }, cleanRq)
    val totalMinCorrected =
      correctedTotal(results.map { case (k, v) => k -> v._2 }, cleanRq)
    val canaryFields =
      s""""canary_before_sec":${f3(canaryBefore)},"canary_after_sec":${f3(canaryAfter)}""" +
      s""","canary_drift":${f3(drift)},"probe_n":${samples.size}""" +
      s""","probe_slow":${slowProbes.size},"probe_p95":${f3(probeP95)}""" +
      s""","foreign_max":${f3(foreignMax)},"mid_contended":$midContended""" +
      s""","pcanary_threads":$pcanaryThreads,"pcanary_before_sec":${f3(pcanaryBefore)}""" +
      s""","pcanary_after_sec":${f3(pcanaryAfter)}""" +
      s""","pcanary_ratio_before":${f3(pratioBefore)},"pcanary_ratio_after":${f3(pratioAfter)}""" +
      s""","cpus":$cpus,"avail_procs":$availProcs,"cgroup_cpus":${f2(cgroupCpus)}""" +
      s""","nr_throttled_delta":$thrNDelta,"throttled_usec_delta":$thrUsDelta""" +
      s""","capacity_starved":$capacityStarved,"throttled":$throttledSitting""" +
      s""","contended":$contended""" +
      s""","canary_sink":${(sink0 ^ sink1 ^ psink0 ^ psink1 ^ probeSink.get()) & 0xff}"""
    val probeMaxJson = windows
      .map { case (k, w) => "\"" + k + "\":" + f2(probeMaxIn(w)) }
      .mkString("{", ",", "}")
    val foreignMaxJson = windows
      .map { case (k, w) => "\"" + k + "\":" + f2(foreignMaxIn(w)) }
      .mkString("{", ",", "}")
    val probeContJson = probeContended.map("\"" + _ + "\"").mkString("[", ",", "]")
    def strArr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val throttledUsJson = throttledUs
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val detail = s"""{"metric":"total","value":${f3(totalFirst)},"unit":"sec"""" +
      s""","protocol":"first-of-$repeat","queries":${jmap(_._1)}""" +
      s""","total_min":${f3(totalMin)},"queries_min":${jmap(_._2)}""" +
      s""","total_corrected":${f3(totalCorrected)}""" +
      s""","total_min_corrected":${f3(totalMinCorrected)}""" +
      s""","shuffle_mb":${jmap(_._3)},"spill_mb":${jmap(_._4)}""" +
      s""","probe_max_ratio":$probeMaxJson,"foreign_max_by_query":$foreignMaxJson""" +
      s""","probe_contended":$probeContJson""" +
      s""","throttled_usec_by_query":$throttledUsJson""" +
      s""","throttle_suspects":${strArr(throttleSuspects)}""" +
      s""","hist_suspects":${strArr(histSuspects)}""" +
      s""","cgroup_suspects":${strArr(cgroupSuspects)}""" +
      s""","hist_path":"$histPath","hist_n":${histMin.size}""" +
      s""",$canaryFields,"requeued":$requeuedJson$anchorDetailJson,"sf":"$sfDir"}"""
    try Files.write(Paths.get(detailPath), detail.getBytes(StandardCharsets.UTF_8)): Unit
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] detail write to $detailPath failed: ${e.getMessage}")
    }
    // Compact stdout line: totals + canary + headline queries only —
    // must stay well under the driver's 2000-char stdout tail window
    // (sbt appends its own trailer inside the same window). The line is
    // AUTO-SHRUNK to fit: headline queries drop first (per-query detail
    // lives in the detail file anyway), then requeue entries (their
    // full evidence is in the detail file too; requeued_n keeps the
    // count visible either way) — at 292 queries the fixed-30 headline
    // outgrew the window and r15 shipped `parsed: null`.
    val headlineMax = sys.env.getOrElse("SPARK_GRAFT_HEADLINE", "30").toInt
    def topJson(h: Int): String = results
      .sortBy { case (_, v) => -(v._1 max v._2) }.take(h)
      .sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f2(v._1) }.mkString("{", ",", "}")
    def stdoutLine(h: Int, rq: Int): String =
      s"""{"metric":"total","value":${f2(totalFirst)},"unit":"sec"""" +
        s""","protocol":"first-of-$repeat","n_queries":${results.size}""" +
        s""","headline_n":$h,"queries":${topJson(h)}""" +
        s""","total_min":${f2(totalMin)}""" +
        s""","total_corrected":${f2(totalCorrected)}""" +
        s""","total_min_corrected":${f2(totalMinCorrected)}""" +
        s""",$canaryFields,"requeued_n":${requeuedEntries.size}""" +
        s""","requeued":${requeuedCompact(rq)}$anchorHeadJson""" +
        s""","detail":"$detailPath","sf":"$sfDir"}"""
    val lineBudget = 1700
    val fitted = ((headlineMax to 0 by -5).map(h => (h, requeuedEntries.size))
        ++ Seq((0, 5), (0, 0)))
      .map { case (h, rq) => stdoutLine(h, rq) }
      .find(_.length <= lineBudget)
      .getOrElse(stdoutLine(0, 0))
    println(fitted)
    spark.stop()
  }
}
