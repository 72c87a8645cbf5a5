package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S8/T9 — the "searchable index" sink (SURVEY.md §2.1), replacing the
  * reference's Elasticsearch client (reference
  * `App/ApiController/ElasticSearchClient/scala.scala:1-5`, an empty
  * stub; `README.md:102-104` describes query-by-field over the index).
  *
  * We reproduce the CAPABILITY — write enriched records so they are
  * efficiently queryable by the README's access paths (hashtag,
  * sentiment, user) — not the wire protocol. The index is a
  * partition-pruned parquet table: `partitionBy` columns become
  * directory partitions, so a query filtering on them reads only
  * matching directories (partition pruning), and parquet min/max +
  * dictionary page stats serve point predicates inside each file. At
  * 100 TB this is the standard lakehouse layout; swapping in a real ES
  * writer is a foreachBatch body change, nothing upstream moves.
  */
object IndexSink {

  /** Start appending a (possibly streaming) DataFrame into the index. */
  def start(enriched: DataFrame, path: String, checkpoint: String,
            partitionCols: Seq[String]): StreamingQuery =
    enriched.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy(partitionCols: _*).parquet(path)
      }
      .start()

  /** Batch path into the same index layout (E2 shares the sink). */
  def writeBatch(enriched: DataFrame, path: String,
                 partitionCols: Seq[String]): Unit =
    enriched.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Query the index — plain DataFrame over the partitioned table;
    * filters on partition columns prune directories (verify with
    * .explain: PartitionFilters). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Upsert semantics (the ES "index document by id" behavior,
    * reference README.md:102-103: re-posting a tweet id replaces it):
    * rows in `updates` replace same-key rows in `existing`; new keys
    * append. Pure relational merge — anti-join keeps the untouched
    * existing rows, union adds every update — so it distributes as two
    * compact-key shuffles. Plain parquet has no transactional MERGE;
    * callers rewrite the affected partitions with the returned frame
    * (at lakehouse scale a table format takes over exactly here).
    *
    * PRECONDITION: `updates` must be key-unique — every update row
    * survives verbatim, so duplicate keys within one batch would all
    * land in the index (unlike ES, where the last write per id wins).
    * When the batch may carry several versions of a key, use
    * [[upsertLatest]] to collapse it first. */
  def upsert(existing: DataFrame, updates: DataFrame,
             keyCols: Seq[String]): DataFrame =
    existing.join(updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*),
        keyCols, "left_anti")
      .unionByName(updates)

  /** [[upsert]] for batches that may contain SEVERAL rows per key:
    * keeps only the latest row per key (max `versionCol`, the caller's
    * event-time/sequence column — ES last-write-wins), then merges.
    * One windowed rank over the (small) updates batch, nothing extra on
    * the big `existing` side. */
  def upsertLatest(existing: DataFrame, updates: DataFrame,
                   keyCols: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    val latest = updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    upsert(existing, latest, keyCols)
  }
}
