package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided corpus (TESTDATA.md).
  *
  * All tables are plain parquet; explicit schemas are unnecessary because
  * parquet is self-describing and the driver generates them deterministically.
  * At 100 TB these would be partitioned directories — the API shape
  * (`dir/name.parquet`) is unchanged; Spark's vectorized parquet reader,
  * predicate pushdown and column pruning all apply identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as three different parquet types across
      // corpus generations: TIMESTAMP(NANOS) (vectorized reader rejects
      // it — read nanos as long, truncate to micros, exactly DuckDB's
      // conversion), TIMESTAMP(MICROS) without tz (reads as
      // TIMESTAMP_NTZ), and plain TIMESTAMP. Normalize ALL of them to
      // the session-tz TIMESTAMP every downstream query was written
      // against. The mains pin the session to UTC, so the NTZ→LTZ cast
      // reinterprets the stored wall-clock as the same instant the
      // oracle's naive TIMESTAMP arithmetic sees.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // integral `div`: double division would lose precision at ~1.7e18 ns
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every corpus table as a temp view named after the table, so
    * spark.sql text matches the DuckDB oracle's FROM clauses 1:1.
    * Memoized per (session, dir): re-registration re-reads 10 parquet
    * footers for nothing when several SQL-form queries run in one
    * session (the common Verify/Bench shape). */
  // Weak keys so dead sessions don't pin entries (identity hashes can be
  // reused after GC); the memo records a dir only AFTER all ten views
  // registered, so a partial failure retries instead of silently skipping.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir): Unit
      }
    }
}
