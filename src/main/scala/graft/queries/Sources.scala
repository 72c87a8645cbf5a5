package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables, Exact}

/** SURVEY.md §2.1 — non-parquet sources and sinks (S2 JSON, S3 CSV,
  * S7 batch sinks, S8 partitioned index), proven by ROUNDTRIP: Spark
  * writes the corpus table out in the target format, reads it back, and
  * computes an aggregate; the oracle computes the same aggregate from
  * the original parquet. Identical results ⇒ the format conversion was
  * lossless for the exercised type surface.
  */
object Sources {

  /** Fresh scratch dir per (query, run) — concurrent Verify/Bench runs
    * at different SFs must not collide. All dirs drain through ONE
    * shutdown hook (a hook Thread per call would accumulate without
    * bound in long-lived sessions that rebuild these queries). */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  private val cleaner: Thread = {
    val t = new Thread(() => scratchDirs.forEach(delete(_)))
    Runtime.getRuntime.addShutdownHook(t)
    t
  }

  private[queries] def scratch(name: String): String = {
    val _ = cleaner // force registration on first use
    val dir = Files.createTempDirectory(s"graft_$name")
    scratchDirs.add(dir.toFile)
    dir.toString
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }

  /** q58 — JSON write→read roundtrip (S2+S7) over nation (int + string
    * surface; schema supplied on read — never inference). */
  val q58 = Q(
    "q58_json_roundtrip",
    (s, dir) => {
      val out = scratch("json")
      val nation = Tables(s, dir, "nation")
      nation.write.mode("overwrite").json(out)
      s.read.schema(nation.schema).json(out)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("key_sum"),
          min(col("n_name")).as("first_name"))
        .orderBy(col("n_regionkey"))
    },
    Some("""
      SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
             MIN(n_name) AS first_name
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
    doc = "S2/S7: JSON sink+scan roundtrip; aggregate must match the parquet original")

  /** q59 — CSV write→read roundtrip (S3+S7) over customer, including a
    * double column (full-precision text rendering both ways). */
  val q59 = Q(
    "q59_csv_roundtrip",
    (s, dir) => {
      val out = scratch("csv")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      cust.write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true").schema(cust.schema).csv(out)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("c_acctbal")).as("bal_sum"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n, ${Exact.sqlDsum("c_acctbal")} AS bal_sum
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    doc = "S3/S7: header CSV sink+scan roundtrip incl. double precision")

  /** q60 — partitioned index roundtrip (S8): write events partitioned by
    * event_type, read back ONE partition, aggregate per day. The read
    * prunes to the single event_type directory (PartitionFilters in the
    * plan — asserted in IndexSinkSpec); this query proves values survive
    * the partition-column round trip. */
  val q60 = Q(
    "q60_partitioned_index",
    (s, dir) => {
      val out = scratch("idx")
      Tables(s, dir, "events")
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .filter(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("value_sum"))
        .orderBy(col("day"))
    },
    Some(s"""
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n,
             ${Exact.sqlDsum("value")} AS value_sum
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1"""),
    doc = "S8: partitionBy sink + pruned scan; the searchable-index layout")

  /** q83 — sort-within-partitions write optimization (O4, SURVEY §2.6):
    * orders is redistributed by priority (ONE hash exchange) and sorted
    * WITHIN each partition by (priority, date, key) — `sortWithinPartitions`,
    * no global range exchange. Leading with the partition column matters:
    * the parquet writer requires its output ordered by the partition
    * columns, and an ordering that already satisfies that prefix avoids
    * the writer injecting a second (order-destroying) sort. The read-back
    * then counts per-FILE ordering violations with a lag window keyed by
    * the actual parquet file (input_file_name + block start + scan
    * sequence id), proving the in-partition order physically survived
    * the round trip: sorted writes are what make parquet min/max page
    * stats selective for the index's date predicates. The oracle pins
    * violations at ZERO and checks counts/extrema — a real differential,
    * since Spark derives its number from the files it wrote. */
  val q83 = Q(
    "q83_sorted_write",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val out = scratch("sorted")
      Tables(s, dir, "orders")
        .repartition(col("o_orderpriority"))
        .sortWithinPartitions(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      // __seq increases in scan order within a task; ordering by
      // (block start, __seq) reconstructs each file's physical row order
      // even when one task reads several files or a file splits.
      val seq = s.read.parquet(out)
        .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"),
          input_file_name().as("__file"),
          input_file_block_start().as("__block"),
          monotonically_increasing_id().as("__seq"))
      val w = Window.partitionBy(col("__file")).orderBy(col("__block"), col("__seq"))
      seq
        .withColumn("__pd", lag(col("o_orderdate"), 1).over(w))
        .withColumn("__pk", lag(col("o_orderkey"), 1).over(w))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("__pd") > col("o_orderdate") ||
              (col("__pd") === col("o_orderdate") && col("__pk") > col("o_orderkey")),
            1L).otherwise(0L)).as("order_violations"),
          min(col("o_orderdate")).as("first_day"),
          max(col("o_orderdate")).as("last_day"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n, CAST(0 AS BIGINT) AS order_violations,
             MIN(o_orderdate) AS first_day, MAX(o_orderdate) AS last_day
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "O4: partition-local sort before a partitioned write — zero global " +
      "sort exchange; per-file order verified from the files themselves")

  /** q86 — z-order clustered write (X21): orders written range-
    * partitioned + sorted on the Morton interleave of (custkey,
    * totalprice), then read back. The build REQUIRES the layout
    * property the operator exists for — per-file min/max boxes bounded
    * in BOTH dimensions (avg normalized width < 0.6; a single-column
    * sort leaves the second dimension at ~1.0) — so a layout regression
    * fails Verify loudly; the oracle then checks the roundtrip lost no
    * content. ZOrderSpec pins the file-skipping contrast vs the
    * single-column layout. */
  val q86 = Q(
    "q86_zorder_write",
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, input_file_name}
      val out = scratch("zorder")
      graft.operators.ZOrder
        .cluster(Tables(s, dir, "orders"), "o_custkey", "o_totalprice", numFiles = 16)
        .write.mode("overwrite").parquet(out)
      val back = s.read.parquet(out)
      for (c <- Seq("o_custkey", "o_totalprice")) {
        val w = back.groupBy(input_file_name())
          .agg(min(col(c).cast("double")).as("mn"), max(col(c).cast("double")).as("mx"))
          .agg(avg(col("mx") - col("mn")).as("aw"),
            (max(col("mx")) - min(col("mn"))).as("gw")).head()
        require(w.getDouble(0) < 0.6 * w.getDouble(1),
          s"z-order layout regressed: avg $c file width ${w.getDouble(0)} vs global ${w.getDouble(1)}")
      }
      back.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Exact.dsum(col("o_totalprice")).as("price_sum"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n,
             ${Exact.sqlDsum("o_totalprice")} AS price_sum,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "X21: Morton-curve clustered write — per-file stats box both " +
      "dimensions (required in-build), content preserved (oracle)")

  /** q87 — small-files compaction (X22): orders shredded into 64 tiny
    * partitions (the streaming-sink pathology), rewritten through the
    * REBALANCE + AQE-advisory path. The build REQUIRES the layout win
    * (≤ 4 files out of 64 in) so a compaction regression fails Verify
    * loudly; the oracle checks the rewrite lost and changed nothing —
    * compaction must be a pure physical rewrite. */
  val q87 = Q(
    "q87_compacted_write",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      val out = scratch("compact")
      graft.operators.Compaction.rebalanceWrite(
        Tables(s, dir, "orders").repartition(64), s"$out/c", targetBytes = 8L << 20)
      val files = new java.io.File(s"$out/c").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      require(files <= 4, s"compaction regressed: 64 tiny partitions wrote $files files")
      s.read.parquet(s"$out/c")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          Exact.dsum(col("o_totalprice")).as("price_sum"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    },
    Some(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
             ${Exact.sqlDsum("o_totalprice")} AS price_sum,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    doc = "X22: REBALANCE+advisory compaction — 64 shreds in, few right-" +
      "sized files out (required in-build), content untouched (oracle)")

  /** q121 — schema-evolution merge read (S14): two parquet generations
    * of the same table — v1 wrote (doc_id, lang), v2 wrote (doc_id,
    * n_chars, source) — read together with `mergeSchema`, the
    * footer-union path every long-lived dataset eventually needs
    * (columns added or dropped between pipeline versions must not
    * force a rewrite of petabytes of old files). Absent columns
    * surface as NULLs; the aggregate over the union proves value and
    * null semantics survive. The oracle reproduces the union
    * explicitly from the original table.
    *
    * Scale note: mergeSchema unions FOOTERS — a metadata job touching
    * EVERY file before the query can even plan; at 25M files that is
    * the metadata-store killer q87's compaction fixes elsewhere. The
    * declared query therefore runs [[pinnedEvolvedRead]] — the evolved
    * schema pinned via `.schema(...)`, zero footer reads, no inference
    * job at all — and SourcesSpec pins the two paths value-equal plus
    * the no-job property; [[mergedEvolvedRead]] stays the discovery
    * path for when the evolved schema is genuinely unknown. */
  def mergedEvolvedRead(s: SparkSession, paths: String*): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)

  def pinnedEvolvedRead(s: SparkSession,
                        schema: org.apache.spark.sql.types.StructType,
                        paths: String*): DataFrame =
    s.read.schema(schema).parquet(paths: _*)

  /** The evolved union schema of the q121 generations — what a catalog
    * would serve in place of footer discovery. */
  def evolvedSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("source", StringType)))
  }

  /** Writes the two schema generations of the documents table and
    * returns their paths — shared by q121 and SourcesSpec. */
  def writeEvolvedGenerations(s: SparkSession, dir: String): (String, String) = {
    val out = scratch("evolve")
    val docs = Tables(s, dir, "documents")
    docs.select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/v1")
    docs.select(col("doc_id"), col("n_chars"), col("source"))
      .write.mode("overwrite").parquet(s"$out/v2")
    (s"$out/v1", s"$out/v2")
  }

  val q121 = Q(
    "q121_schema_merge",
    (s, dir) => {
      val (v1, v2) = writeEvolvedGenerations(s, dir)
      pinnedEvolvedRead(s, evolvedSchema, v1, v2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          min(col("source")).as("first_src"))
        .orderBy(col("lang").asc_nulls_first)
    },
    Some("""
      WITH m AS (
        SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars,
               CAST(NULL AS VARCHAR) AS source
        FROM documents
        UNION ALL
        SELECT doc_id, NULL, n_chars, source FROM documents)
      SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
             MIN(source) AS first_src
      FROM m GROUP BY lang ORDER BY lang NULLS FIRST"""),
    doc = "S14: schema-evolution read across generations — pinned user " +
      "schema, zero footer reads; absent columns are NULL, no data rewrite")

  /** q134 — ORC write→read roundtrip (S15): the other columnar format
    * Spark bundles natively (orc-core in /opt/spark/jars). Same
    * roundtrip proof device as q58/q59: write `part` as ORC, read it
    * back, aggregate; the oracle aggregates the parquet original —
    * identical results ⇒ the format conversion was lossless for the
    * int/long/string/double surface. ORC gets the same vectorized
    * reader + predicate pushdown treatment as parquet, so the engine's
    * scan posture carries over unchanged. */
  val q134 = Q(
    "q134_orc_roundtrip",
    (s, dir) => {
      val out = scratch("orc")
      val part = Tables(s, dir, "part")
      part.write.mode("overwrite").orc(out)
      s.read.schema(part.schema).orc(out)
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n"), sum(col("p_partkey")).as("key_sum"),
          min(col("p_name")).as("first_name"),
          Exact.dsum(col("p_retailprice")).as("price_sum"))
        .orderBy(col("p_size"))
    },
    Some(s"""
      SELECT p_size, COUNT(*) AS n, CAST(SUM(p_partkey) AS BIGINT) AS key_sum,
             MIN(p_name) AS first_name,
             ${Exact.sqlDsum("p_retailprice")} AS price_sum
      FROM part GROUP BY p_size ORDER BY p_size"""),
    doc = "S15: ORC sink+scan roundtrip — Spark's second native columnar " +
      "format, same vectorized-scan posture as parquet")

  /** q135 — XML parse/serialize roundtrip (F-xml, Spark 4 native):
    * `to_xml(struct(...))` → `from_xml(schema)` → fields — the
    * message-feed surface (XML payloads are the JSON of enterprise
    * integration). Double columns stay OUT of the XML payload: float
    * text formatting is not a stable cross-format contract, exactly
    * why q58's JSON roundtrip pins its schema too. DuckDB has no XML
    * type, so the oracle computes the same aggregate from the base
    * table — the roundtrip being lossless IS the assertion. */
  val q135 = Q(
    "q135_xml_roundtrip",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val xmlSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType)))
      Tables(s, dir, "events")
        .select(to_xml(struct(col("event_id"), col("user_id"),
          col("event_type"))).as("xml"))
        .select(from_xml(col("xml"), xmlSchema).as("r"))
        .groupBy(col("r.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("r.user_id")).as("user_sum"),
          max(col("r.event_id")).as("max_id"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS user_sum,
             MAX(event_id) AS max_id
      FROM events GROUP BY event_type ORDER BY event_type"""),
    doc = "F-xml: native to_xml/from_xml roundtrip — schema-pinned parse, " +
      "aggregate must match the relational original")

  val all: Seq[Q] = Seq(q58, q59, q60, q83, q86, q87, q121, q134, q135)
}
