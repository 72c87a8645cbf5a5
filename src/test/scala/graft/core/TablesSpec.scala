package graft.core

import java.nio.file.Files
import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The events.ts normalization contract: the driver has shipped the
  * corpus with THREE different parquet encodings of `ts` across
  * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
  * surfaces only via nanosAsLong → LongType), TIMESTAMP(MICROS) without
  * timezone (reads as TIMESTAMP_NTZ), and plain session TIMESTAMP.
  * Every query was written against session-tz TIMESTAMP, and 45 of them
  * broke when generation 3 landed mid-round — this spec pins that ALL
  * three encodings load to the SAME type and the SAME instants, so the
  * next corpus regeneration surfaces here instead of as 45 oracle
  * failures. */
class TablesSpec extends SparkSpecBase {

  // one micros instant, exercised with a non-zero sub-second part
  private val micros = Seq(
    1704067200123456L, // 2024-01-01T00:00:00.123456Z
    1704070800000001L)

  test("events.ts loads as session-tz TIMESTAMP with identical instants " +
    "from all three historical parquet encodings") {
    val s = spark
    import s.implicits._
    def writeAndLoad(dir: String)(write: String => Unit): (String, Seq[Long]) = {
      write(s"$dir/events.parquet")
      val df = Tables(s, dir, "events")
      assert(df.schema("ts").dataType === TimestampType,
        s"$dir: ${df.schema("ts").dataType}")
      (dir, df.select(unix_micros($"ts")).as[Long].collect().sorted.toSeq)
    }

    // generation 1: TIMESTAMP(NANOS) — the reader surfaces it as LONG
    // nanos under nanosAsLong; a plain long column takes the same
    // LongType branch the nanos files did
    val genNanos = writeAndLoad(Files.createTempDirectory("g1").toString) { p =>
      micros.map(m => Tuple1(m * 1000L)).toDF("ts").write.parquet(p)
    }
    // generation 3 (current): TIMESTAMP(MICROS) without tz → NTZ
    val genNtz = writeAndLoad(Files.createTempDirectory("g3").toString) { p =>
      micros.map(m => Tuple1(
        java.time.LocalDateTime.ofEpochSecond(
          m / 1000000L, (m % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC))).toDF("ts").write.parquet(p)
    }
    // plain session-tz TIMESTAMP (the type the queries consume)
    val genLtz = writeAndLoad(Files.createTempDirectory("gx").toString) { p =>
      micros.map(m => Tuple1(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(m / 1000000L,
          (m % 1000000L) * 1000L)))).toDF("ts").write.parquet(p)
    }
    val expect = micros.sorted
    for ((dir, got) <- Seq(genNanos, genNtz, genLtz))
      assert(got === expect, s"$dir loaded $got, expected $expect")
  }
}
