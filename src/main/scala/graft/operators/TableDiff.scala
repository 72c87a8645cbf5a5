package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table reconciliation (SURVEY.md §2.11a X23): which rows were
  * added, removed, or changed between two versions of a table — the
  * validation step after every backfill, migration, or pipeline rewrite
  * ("did the new job produce the same table?").
  *
  * Scale shape: each side is first collapsed to (key, fingerprint) —
  * md5 over the non-key columns in a FIXED (sorted-name) order with an
  * explicit null sentinel, so the fingerprint is schema-order- and
  * null-unambiguous. The full-outer join then shuffles ~48 bytes per
  * row regardless of row width: diffing two wide 100 TB tables moves
  * keys and fingerprints, never payloads. (md5 here because the twin
  * must be reproducible in the DuckDB oracle; swap `fingerprint` for
  * xxhash64 when cross-engine reproducibility is not needed — same
  * plan, cheaper hash.)
  *
  * Encoding: each value renders as `V<charlen>:<chars>` (NULL → `N`)
  * and the fields concatenate with NO separator. The length prefix
  * makes the byte stream uniquely decodable, so neither separator
  * characters inside values (('a|b','c') vs ('a','b|c')) nor a NULL
  * sentinel appearing as real data can make two different rows
  * fingerprint equal.
  */
object TableDiff {

  /** One fingerprint column over `cols` of `df` in sorted-name order —
    * as 16 raw bytes (`unhex`), not the 32-char hex string: the
    * fingerprint exists to make the shuffle narrow, so it should not
    * double its own width on the wire. */
  def fingerprint(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column =
    unhex(md5(concat(
      cols.sorted.map { c =>
        val v = col(c).cast("string")
        // concat propagates null: a NULL value collapses the whole
        // V-term to null and coalesce emits the unambiguous "N" tag.
        coalesce(concat(lit("V"), length(v), lit(":"), v), lit("N"))
      }: _*)))

  /** Per-key diff status: (keyCols…, status ∈ added|removed|changed|same).
    * `added` = key only in `right` (the new version); `removed` = only
    * in `left`; `changed` = both sides, different non-key fingerprint. */
  def diff(left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(left.columns.sorted.sameElements(right.columns.sorted),
      s"schema mismatch: ${left.columns.sorted.mkString(",")} vs " +
        s"${right.columns.sorted.mkString(",")} — diff needs identical columns")
    val nonKey = left.columns.filterNot(keyCols.contains).toSeq
    val l = left.select(keyCols.map(col) :+ fingerprint(left, nonKey).as("__l"): _*)
    val r = right.select(keyCols.map(col) :+ fingerprint(right, nonKey).as("__r"): _*)
    l.join(r, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__l").isNull, "added")
          .when(col("__r").isNull, "removed")
          .when(col("__l") =!= col("__r"), "changed")
          .otherwise("same").as("status"): _*)
  }

  /** The one-line report: counts per status. */
  def summary(left: DataFrame, right: DataFrame, keyCols: Seq[String]): DataFrame =
    diff(left, right, keyCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
