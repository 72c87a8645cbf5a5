package graft.operators

import java.nio.file.Files

import graft.SparkSpecBase
import graft.core.Tables
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpecBase {

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("rebalance write collapses a many-tiny-partitions input to few " +
    "right-sized files; a naive write keeps every tiny file") {
    val s = spark
    val dir = Files.createTempDirectory("graft_compact").toString
    // the streaming-sink pathology: 64 partitions of ~25 rows each
    val shredded = Tables(s, sf, "orders").repartition(64)

    shredded.write.mode("overwrite").parquet(s"$dir/naive")
    assert(parquetFiles(s"$dir/naive").length === 64)

    Compaction.rebalanceWrite(shredded, s"$dir/compact", targetBytes = 4L << 20)
    val compacted = parquetFiles(s"$dir/compact")
    assert(compacted.length <= 4,
      s"expected few compacted files, got ${compacted.length}")

    // compaction is a rewrite, never a transformation
    val a = s.read.parquet(s"$dir/naive").orderBy("o_orderkey").collect()
    val b = s.read.parquet(s"$dir/compact").orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("rebalance-by-column splits a hot value's reducer into mapper-range " +
    "chunks — no single giant file, more files than static reducers") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_split").toString
    // 90% of rows share k=0; 8 mappers; payload is distinct-hex so the
    // hot reducer's ~2.4 MB raw doesn't compress below the advisory
    val skewed = s.range(0, 20000, 1, 8).select(
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
      concat(md5($"id".cast("string")), md5(($"id" * 31).cast("string")),
        md5(($"id" * 131).cast("string")), md5(($"id" * 1313).cast("string")))
        .as("payload"))
    Compaction.rebalanceWrite(skewed, s"$dir/split", targetBytes = 128L << 10,
      byCols = Seq("k"))
    val n = parquetFiles(s"$dir/split").length
    // 4 static reducers; >4 files proves the hot partition was split
    assert(n > 4, s"expected the hot reducer split into chunks, got $n file(s)")
    assert(s.read.parquet(s"$dir/split").count() === 20000L)
  }
}
