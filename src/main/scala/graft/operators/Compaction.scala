package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-files compaction (SURVEY.md §2.11a X22) — the `OPTIMIZE`
  * maintenance operation every long-lived table needs.
  *
  * Streaming micro-batches, per-partition writers and over-parallel
  * jobs all produce the same pathology at scale: millions of KB-sized
  * files whose open/footer/list overhead dwarfs the data (a 100 TB
  * table in 4 MB files is 25M files — the metadata store becomes the
  * bottleneck before a byte is read). Compaction rewrites them as
  * ~`targetBytes` files.
  *
  * Spark-first mechanics: the REBALANCE hint + AQE's advisory partition
  * size do all the work — `RebalancePartitions` inserts a round-robin
  * shuffle whose output AQE re-plans from RUNTIME map statistics:
  * undersized outputs coalesce, oversized ones split
  * (`OptimizeSkewInRebalancePartitions`), so the file count tracks the
  * actual bytes, not a guessed partition count. A static
  * `repartition(n)` cannot do this: n is fixed before any size is
  * known, and one hot partition stays one oversized file.
  *
  * The advisory size is set only for the duration of the write and
  * restored after — callers' session tuning is untouched.
  */
object Compaction {

  /** Rewrite `df` under `path` as ~targetBytes parquet files (target is
    * COMPRESSED shuffle bytes; on-disk files track it after encoding).
    *
    * @param byCols empty = round-robin (pure compaction). Non-empty =
    *   hash-distribute on these columns first — the shape for compacting
    *   a partitioned table (cluster by its partition columns), where a
    *   hot value would make one reducer's output a giant file: AQE's
    *   skew rule splits that reducer back into mapper-range chunks, so
    *   even the hot value lands in ~targetBytes files. */
  def rebalanceWrite(df: DataFrame, path: String, targetBytes: Long,
                     byCols: Seq[String] = Nil): Unit = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = conf.getOption(key)
    conf.set(key, targetBytes.toString)
    // hint params must be UNresolved attributes (functions.col), not
    // df.col's resolved references — ResolveCoalesceHints rejects those
    val hinted =
      if (byCols.isEmpty) df.hint("rebalance")
      else df.hint("rebalance", byCols.map(org.apache.spark.sql.functions.col): _*)
    try hinted.write.mode("overwrite").parquet(path)
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None    => conf.unset(key)
    }
  }

  /** Compact an existing parquet directory in place is deliberately NOT
    * offered: rewriting over the input you are reading is only safe
    * with a transactional table format. Write to a fresh dir and swap. */
}
