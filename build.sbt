ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdataprojspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// ---- parallel test groups (r19, verdict item 2) ----
// The suite outgrew the driver's single-JVM `sbt test` budget (929
// tests ≈ 22 min sequential; the r18 driver run was killed mid-suite
// with no summary line). Suites are split round-robin into N forked
// JVM groups run CONCURRENTLY — each group gets its own JVM and its
// own SparkSession (SparkSpecBase is per-JVM), so there is no shared
// mutable session state across groups; within a group suites still
// run sequentially, exactly as before. N × local[4] = 16 Spark
// threads + JVM overhead fits the 32-core/128 GiB box with headroom.
// SPARK_GRAFT_TEST_GROUPS=1 restores the old single-JVM behavior.
val testGroupN = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt
// Measured long pole (r19): StreamingSpec alone runs ~7 min (69
// micro-batch tests, inherently sequential within the suite) — it gets
// a group of its own so the suite wall-clock is bounded by it, not by
// whichever round-robin group it lands in (4 even groups measured
// 18.5 min wall vs ~22 min single-JVM; the pinned split targets ~8).
val pinnedAloneSuites = Set("graft.streaming.StreamingSpec")
Test / testGrouping := {
  val opts = ForkOptions(
    javaHome = (Test / javaHome).value,
    outputStrategy = (Test / outputStrategy).value,
    bootJars = Vector.empty,
    workingDirectory = Some((Test / baseDirectory).value),
    runJVMOptions = (Test / javaOptions).value.toVector,
    connectInput = false,
    envVars = (Test / envVars).value)
  val defs = (Test / definedTests).value.sortBy(_.name)
  val (pinned, rest) =
    if (testGroupN <= 1) (Nil, defs)
    else defs.partition(t => pinnedAloneSuites(t.name))
  val spread = (testGroupN - pinned.size) max 1
  val restGroups = rest.zipWithIndex
    .groupBy(_._2 % spread).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"group-$i", ts.map(_._1), Tests.SubProcess(opts))
    }
  val pinnedGroups = pinned.zipWithIndex.map { case (t, i) =>
    Tests.Group(s"pinned-$i-${t.name}", Seq(t), Tests.SubProcess(opts))
  }
  pinnedGroups ++ restGroups
}
// sbt's default restrictions cap concurrent forked test groups at 1;
// raise exactly that cap, keep the global task parallelism default.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, testGroupN))
// Relay forked runMain output (Bench/Verify) STRAIGHT to stdout, no
// "[info] " logger prefix: the per-round driver machine-parses the last
// stdout line of graft.Bench, and the prefix breaks strict JSON parsing
// (r1-r4 artifacts all record parsed:null).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
