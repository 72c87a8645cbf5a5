package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §2.3 J11).
  *
  * A plain shuffle join on a hot key sends every row of that key to ONE
  * reducer — at 100 TB a handful of viral keys stall the stage while
  * hundreds of executors idle. Salting splits each hot key's rows across
  * `salts` reducers: the fact side gets a per-row salt, the (small) dim
  * side is replicated once per salt value, and the join key becomes
  * (key, salt). The result set is exactly the plain join's — salting is
  * pure physical re-distribution, which is why it oracle-checks against
  * an unsalted DuckDB join.
  *
  * Use when the dim side is too big to broadcast but small enough to
  * replicate `salts`x, and AQE's skew-join splitting isn't available or
  * isn't enough (it only splits map outputs; salting also spreads the
  * probe-side hash buckets).
  *
  * The salt is xxhash64 over the fact ROW's columns (or the caller's
  * `saltCols`), NOT the join key alone — hashing just the key would put
  * the whole hot key in one salt bucket again, defeating the point. A
  * row-content hash is also DETERMINISTIC under task retries, unlike
  * `monotonically_increasing_id()`: with an id-based salt, a lost stage
  * re-assigns ids, silently re-shuffling rows across reducers mid-query
  * — same result set, but the skew split can re-skew exactly when the
  * cluster is already degraded.
  *
  * DUPLICATE-ROW CAVEAT: a content hash sends EXACT duplicate rows to
  * one salt bucket — and wholesale-duplicated rows are a common cause
  * of the very skew being mitigated. So pass `saltCols = <a unique
  * key>` whenever the fact table has one: unique key ⇒ full spread AND
  * strict retry-determinism. When `saltCols` is empty (no unique key
  * known), the salt additionally folds in the row's (partition id,
  * in-partition position) so duplicates still spread; that position is
  * stable for deterministic scan-rooted inputs (same files, same
  * splits, same order) but can remap rows across salt buckets if a
  * LOST-STAGE retry replays a nondeterministic upstream — result set
  * unchanged, spread possibly re-skewed. Spreading the hot key is the
  * operator's purpose, so the default trades the rarer retry corner
  * for it; callers wanting both guarantees pass a unique key.
  */
object SaltedJoin {

  /** @param saltCols columns whose combined hash spreads the hot key's
    *   rows (ideally the fact's primary key); empty = all fact columns
    *   plus a per-row position tiebreaker (see duplicate-row caveat) */
  def join(facts: DataFrame, dim: DataFrame, key: String, salts: Int,
           saltCols: Seq[String] = Nil): DataFrame = {
    val src =
      if (saltCols.nonEmpty) saltCols.map(col)
      // monotonically_increasing_id = partition id ⋅ 2³³ + row position:
      // the deterministic-per-scan tiebreaker that spreads exact dups.
      else facts.columns.toSeq.map(col) :+ monotonically_increasing_id()
    val saltedFacts = facts.withColumn(
      "__salt", pmod(xxhash64(src: _*), lit(salts.toLong)))
    val replicatedDim = dim.withColumn(
      "__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFacts.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
