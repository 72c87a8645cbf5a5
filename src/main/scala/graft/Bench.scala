package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/shuffle paths once, untimed, so the first
    // measured query doesn't absorb cluster start-up cost.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Local iteration only (driver runs repeat=1): report the min of N
    // runs to cut scheduler/GC noise out of A/B comparisons.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val times = (1 to repeat).flatMap { _ =>
          // Operators that persist() intermediates register plans in the
          // CacheManager; drop them so every repeat measures real work.
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          // a failed repeat contributes NO time — min over elapsed-to-
          // failure would report a fast crash as a fast query
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        }
        name -> (if (times.nonEmpty) times.min else -1.0)
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
