package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM per `sbt test`,
  * `build.sbt:12`). Mirrors the driver's Verify session config so test
  * behavior == gate behavior (UTC, small shuffle partitions, AQE on).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (bucketed-join tests) go to scratch, not the repo
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the limit-k/metadata-frame windows warn per task; across 929
    // tests that is thousands of log lines of pure I/O (r19, verdict
    // item 2 — the same flood ate the driver's test-output tail)
    Bench.silenceKnownBenignWarnings()
    s
  }
}
