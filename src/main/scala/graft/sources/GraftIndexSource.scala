package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path for the searchable index (S8/S11 as a full
  * V2 citizen; `SyntheticDocsSource` proves the read stack, this proves
  * the write stack): TableProvider → SupportsWrite → WriteBuilder →
  * Write with `RequiresDistributionAndOrdering` → BatchWrite →
  * DataWriterFactory → DataWriter → commit protocol.
  *
  * The Write DECLARES its layout requirements instead of the caller
  * hand-repartitioning: `requiredDistribution` = clustered on the
  * `routing` column (every value of the routing key lands in exactly one
  * writer task — ES shard routing semantics), `requiredOrdering` = the
  * `sort` column ascending within each task (sorted segments make index
  * merges cheap). Spark plans the exchange + partition-local sort to
  * satisfy both — the engine-side guarantee the test asserts.
  *
  * Storage is an in-JVM store filled by the standard V2 two-phase
  * protocol (writers buffer and return rows in their commit MESSAGE;
  * the driver-side `BatchWrite.commit` publishes them atomically — the
  * same shape Spark's own InMemoryTable uses). A production variant
  * swaps the store for an index/file writer; every planning contract
  * upstream of `DataWriter.write` stays identical.
  *
  * Options: `name` (index name), `routing` (string column), `sort`
  * (long column), `shards` (fixed writer-task count, the ES shard
  * model — declared via `requiredNumPartitions`, which also keeps AQE
  * from coalescing a small write into one task; 0 = let Spark choose).
  * Modes: append, overwrite (truncate).
  */
class GraftIndexSource extends TableProvider {
  // writes supply the DataFrame's schema (so a first write can CREATE
  // the index); reads fall back to inferSchema from the store
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftIndexStore.schemaOf(options.get("name"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftIndexTable(schema,
      properties.get("name"),
      Option(properties.get("routing")).getOrElse("routing"),
      Option(properties.get("sort")).getOrElse("sort"),
      Option(properties.get("shards")).map(_.toInt).getOrElse(0))
}

/** Driver-side index store + the per-write layout evidence the specs
  * assert (which routing keys each writer task saw, and whether rows
  * arrived pre-sorted). */
object GraftIndexStore {
  final case class WriterEvidence(partitionId: Int, routingSeen: Set[String],
                                  arrivedSorted: Boolean)
  private val tables = TrieMap.empty[String, (StructType, Vector[InternalRow])]
  private val evidence = TrieMap.empty[String, Vector[WriterEvidence]]

  def schemaOf(name: String): StructType =
    tables.get(name).map(_._1)
      .getOrElse(throw new IllegalArgumentException(s"no such index: $name"))
  def rowsOf(name: String): Vector[InternalRow] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)
  def evidenceOf(name: String): Vector[WriterEvidence] =
    evidence.getOrElse(name, Vector.empty)

  private[sources] def publish(name: String, schema: StructType,
                               rows: Vector[InternalRow],
                               ev: Vector[WriterEvidence],
                               truncate: Boolean): Unit = synchronized {
    val prior = if (truncate) Vector.empty else rowsOf(name)
    tables.put(name, (schema, prior ++ rows)): Unit
    evidence.put(name, ev): Unit
  }
  def drop(name: String): Unit = { tables.remove(name); evidence.remove(name): Unit }
}

private class GraftIndexTable(schema0: StructType, name0: String,
                              routing: String, sortCol: String, shards: Int)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_index($name0)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = GraftIndexStore.schemaOf(name0)
      override def toBatch: Batch = this
      // Test-scale read: one partition holding the driver-side rows. The
      // production read path with pruning/pushdown/partitioning is
      // demonstrated by SyntheticDocsSource; this source exists for the
      // WRITE stack.
      override def planInputPartitions(): Array[InputPartition] =
        Array(GraftIndexPartition(GraftIndexStore.rowsOf(name0)))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
            val rows = p.asInstanceOf[GraftIndexPartition].rows
            new PartitionReader[InternalRow] {
              private var i = -1
              override def next(): Boolean = { i += 1; i < rows.length }
              override def get(): InternalRow = rows(i)
              override def close(): Unit = ()
            }
          }
        }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftIndexWriteBuilder(info, name0, routing, sortCol, shards)
}

private case class GraftIndexPartition(rows: Vector[InternalRow]) extends InputPartition

private class GraftIndexWriteBuilder(info: LogicalWriteInfo, name: String,
                                     routing: String, sortCol: String, shards: Int)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.column(routing)))
    override def requiredOrdering(): Array[SortOrder] =
      Array(Expressions.sort(Expressions.column(sortCol), SortDirection.ASCENDING))
    override def requiredNumPartitions(): Int = shards

    override def toBatch: BatchWrite = new BatchWrite {
      private val schema = info.schema()
      private val truncateOnCommit = doTruncate
      override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
        new GraftIndexWriterFactory(schema,
          schema.fieldIndex(routing), schema.fieldIndex(sortCol))
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val ms = messages.collect { case m: GraftIndexCommit => m }
        GraftIndexStore.publish(name, schema,
          ms.toVector.flatMap(_.rows),
          ms.toVector.map(m =>
            GraftIndexStore.WriterEvidence(m.partitionId, m.routingSeen, m.arrivedSorted)),
          truncateOnCommit)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

private case class GraftIndexCommit(partitionId: Int, rows: Vector[InternalRow],
                                    routingSeen: Set[String], arrivedSorted: Boolean)
  extends WriterCommitMessage

private class GraftIndexWriterFactory(schema: StructType, routingIdx: Int,
                                      sortIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      private var seen = Set.empty[String]
      private var sorted = true
      private var prev = Long.MinValue
      override def write(r: InternalRow): Unit = {
        buf += r.copy()
        seen += r.getUTF8String(routingIdx).toString
        val v = r.getLong(sortIdx)
        if (v < prev) sorted = false
        prev = v
      }
      override def commit(): WriterCommitMessage =
        GraftIndexCommit(partitionId, buf.result(), seen, sorted)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
