package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkEntry

/** Physical-plan dump for the optimization rounds' evidence files
  * (`plans/rN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query ...]
  *
  * For each named query (default: all), writes
  * `<outDir>/<name>_<suffix>.txt` holding `.explain("formatted")` of the
  * query as built against `sfDir`. Plans are captured WITHOUT executing
  * (initial AQE plan — the shape the optimizer chose statically; the
  * bench's noop sink runs the same plan with AQE re-optimization on
  * top). Failures are per-query and non-fatal, mirroring Verify.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args
    val only: Set[String] = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceKnownBenignWarnings()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(FormattedMode)
          Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] $name -> ${name}_$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
