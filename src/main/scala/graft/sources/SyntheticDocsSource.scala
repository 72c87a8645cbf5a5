package graft.sources

import java.security.MessageDigest
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic document corpus that exists
  * only as a generator — `spark.read.format("graft.sources.SyntheticDocsSource")
  * .option("rows", N).option("partitions", P)` materializes N documents
  * with zero storage. This is the scale-testing source a 100 TB pipeline
  * needs: any corpus size on demand, bit-identical on every read
  * (documents are pure functions of doc_id via md5), partitioned for
  * full parallelism.
  *
  * Demonstrates the complete V2 read stack: TableProvider → Table →
  * ScanBuilder (with COLUMN PRUNING via pruneColumns and FILTER
  * PUSHDOWN on doc_id — range predicates narrow each partition's id
  * range at PLANNING time, so `doc_id >= N-10` reads 10 rows no matter
  * how large N is) → Batch → PartitionReaderFactory.
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SyntheticDocsSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en", "es", "zh", "de", "fr")
  private val vocab = Array("data", "query", "line", "table", "window", "key",
    "scan", "merge", "sort", "value", "part", "group", "row", "the", "a")

  /** Document i: 20 tokens chosen by the md5 stream of (i, position) —
    * deterministic, engine-independent, uniform. */
  def textFor(id: Long): String = {
    val md = MessageDigest.getInstance("MD5")
    (0 until 20).map { p =>
      val h = md.digest(s"$id:$p".getBytes("UTF-8"))
      vocab(java.lang.Math.floorMod(h(0).toInt, vocab.length))
    }.mkString(" ")
  }

  def langFor(id: Long): String = langs((id % langs.length).toInt)
}

private class SyntheticDocsTable(rows: Long, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocsSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L              // inclusive doc_id lower bound
  private var hi = rows            // exclusive doc_id upper bound
  private var pushed = Array.empty[Filter]
  private var requiredSchema = SyntheticDocsSource.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(schema: StructType): Unit = requiredSchema = schema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def toBatch: Batch = this
    override def description(): String =
      s"SyntheticDocs range=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}]"
    override def planInputPartitions(): Array[InputPartition] = {
      if (hi <= lo) return Array.empty
      val span = hi - lo
      val per = math.max(1L, (span + partitions - 1) / partitions)
      (lo until hi by per).map(s =>
        SyntheticPartition(s, math.min(s + per, hi)): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new SyntheticReaderFactory(requiredSchema)
  }
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition

private class SyntheticReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = {
        val values = schema.fieldNames.map {
          case "doc_id" => id.asInstanceOf[AnyRef]
          case "lang"   => UTF8String.fromString(SyntheticDocsSource.langFor(id))
          case "text"   => UTF8String.fromString(SyntheticDocsSource.textFor(id))
        }
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
