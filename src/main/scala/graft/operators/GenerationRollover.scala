package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Generation rollover — the storage REAPER every takedown ledger in
  * the maintenance family promises a consumer for (SURVEY.md §2.11a
  * X108; the q233/q234/q239/q241/q242 ledgers all document "the
  * storage reaper's generation-rollover input" as their downstream).
  *
  * The takedown posture (q233) is deliberate non-compaction: freed
  * slots are RECORDED, never reclaimed in place, because compacting
  * would shift every downstream (bin, offset) reference. The cost of
  * that posture is monotone tombstone accretion — a corpus at steady
  * takedown load serves an ever-larger dead fraction. The reaper is
  * the other half of the contract: when the ledger's dead-token
  * fraction crosses [[ThresholdPpm]], emit generation G+1 —
  *
  *  - SURVIVORS REPACKED: the G+1 packing map is
  *    `Text.packingMapFromCounts` over the live docs, with per-doc
  *    token counts derived from generation G's own segment rows
  *    (sum of seg_len per doc — exact, no re-tokenization, no text
  *    scan). Concat-and-chunk over the same doc_id order means the
  *    result hash-matches packing the survivors from scratch — the
  *    law q245's oracle pins.
  *  - TRANSLATION MAP: dataloaders, curricula and audits key on
  *    generation-G (bin, offset) references; the rollover emits one
  *    row per intersection of an old surviving segment with a new
  *    segment in DOC coordinate space: (doc_id, old_bin_id,
  *    old_bin_off, new_bin_id, new_bin_off, span_len). Re-keying a
  *    G reference is one lookup: find the translation row covering
  *    (old_bin_id, old_bin_off) and add the in-span delta. Repacking
  *    re-segments split docs, so old→new is many-to-many at segment
  *    grain but exact and loss-free at token grain (spans partition
  *    every surviving token; q245/q246's specs pin coverage).
  *
  * Scale: one broadcast-sized anti-join to drop tombstoned docs, one
  * per-doc aggregate for counts, the q209 empty-group PrefixScan for
  * the new map, and a doc_id equi-join for the translation whose
  * fan-out is bounded by segments-per-doc (≤ ⌈len/L⌉+1 each side,
  * trimmed to overlaps ≤ old+new segments per doc). Nothing touches
  * raw text; the only corpus-sized shuffles are the ones the packing
  * build already pays. The index/graph generation members rebuild
  * pointwise from live rows under their frozen models (q234/q241's
  * maintained ≡ rebuilt-minus-deleted law makes the rebuild and the
  * maintained store interchangeable — the rollover just swaps the
  * serving generation atomically, q139's posture).
  */
object GenerationRollover {

  /** Declared dead-fraction threshold (ppm of TOKENS, the unit
    * training actually pays for): roll over once a quarter of the
    * packed tokens are tombstoned. Below it, tombstone-skipping reads
    * cost less than a full repack + re-key. */
  val ThresholdPpm = 250000L

  /** Dead-token fraction (ppm) of a [[graft.queries.Text.packingTakedown]]
    * ledger — the reaper's scheduling input. One aggregate over the
    * bins frame (bins-not-docs sized); the 1-row collect is the
    * sanctioned reduced-aggregate class.
    *
    * Arithmetic scale contract: the sums are taken in DECIMAL(38,0),
    * not BIGINT, because a ~100 TB corpus is ~10¹³–10¹⁴ tokens and
    * the ×10⁶ ppm step would push a BIGINT sum past 2⁶³ (ANSI mode
    * throws, non-ANSI silently corrupts the trigger). DECIMAL(38,0)
    * keeps every intermediate exact up to 10³⁸; the quotient is
    * floored back to BIGINT by `div`, so results at every tested SF
    * are bit-identical to the old BIGINT path. */
  def deadFractionPpm(ledger: DataFrame): Long =
    ledger.agg(coalesce(
        expr("sum(cast(freed_tokens as decimal(38,0))) * 1000000 div " +
          "(sum(cast(live_tokens as decimal(38,0))) + " +
          "sum(cast(freed_tokens as decimal(38,0))))"), lit(0L))
        .as("ppm"))
      .head().getLong(0)

  /** Execute the rollover: `(newMap, translation)`.
    *
    * `map`: the generation-G packing map (q209 schema: doc_id,
    * bin_id, bin_off, doc_off, seg_len, split). `deletedIds`: the
    * accumulated tombstone set (first column = doc id). `newMap` has
    * the same schema as `map`; `translation` is (doc_id, old_bin_id,
    * old_bin_off, new_bin_id, new_bin_off, span_len). */
  def rollover(map: DataFrame, deletedIds: DataFrame, L: Int)
      : (DataFrame, DataFrame) = {
    val del = deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("doc_id"))
      .distinct()
    val live = map.join(del, Seq("doc_id"), "left_anti").barrier()
    // per-doc token counts from generation G's own rows — packing
    // covers every doc token exactly once, so sum(seg_len) = n_tok
    val counts = live.groupBy(col("doc_id"))
      .agg(sum(col("seg_len")).as("n_tok"))
    val newMap = graft.queries.Text.packingMapFromCounts(counts, L).barrier()
    val o = live.select(col("doc_id"),
      col("bin_id").as("old_bin_id"), col("bin_off").as("old_bin_off"),
      col("doc_off").as("__odo"), col("seg_len").as("__olen"))
    val n = newMap.select(col("doc_id"),
      col("bin_id").as("new_bin_id"), col("bin_off").as("new_bin_off"),
      col("doc_off").as("__ndo"), col("seg_len").as("__nlen"))
    val translation = o.join(n, Seq("doc_id"))
      .filter(col("__odo") < col("__ndo") + col("__nlen") &&
        col("__ndo") < col("__odo") + col("__olen"))
      .withColumn("__s", greatest(col("__odo"), col("__ndo")))
      .withColumn("__e", least(col("__odo") + col("__olen"),
        col("__ndo") + col("__nlen")))
      .select(col("doc_id"),
        col("old_bin_id"),
        (col("old_bin_off") + col("__s") - col("__odo")).as("old_bin_off"),
        col("new_bin_id"),
        (col("new_bin_off") + col("__s") - col("__ndo")).as("new_bin_off"),
        (col("__e") - col("__s")).as("span_len"))
    (newMap, translation)
  }

  /** Compose two adjacent translation maps (G→G+1 ∘ G+1→G+2) into the
    * direct G→G+2 map — the offline chain-collapse a serving system
    * runs when the generation chain outgrows its per-lookup hop budget
    * (T29's documented consumer; after the collapse, dataloaders pay
    * ONE covering-span lookup again regardless of how many rollovers
    * have fired).
    *
    * Mechanics: intersect spans in the MIDDLE generation's (bin,
    * offset) coordinates — an equi-join on (doc_id, middle bin) with
    * the bounded residual range predicate, the q251 lookup shape —
    * then coalesce maximal bi-contiguous runs (adjacent in BOTH the
    * old and the new coordinates) with a per-doc gaps-and-islands
    * pass. Composition refines span boundaries wherever a middle-
    * generation segment cut fell inside a direct span; coalescing
    * restores maximality, and maximal bi-contiguous runs are UNIQUE,
    * so composed ≡ the single-shot direct translation row for row —
    * the law q254 hash-gates and RolloverSpec pins.
    *
    * Scale: the join fan-out is bounded by spans-per-(doc, middle
    * bin); the window partitions by doc_id ordered by old position —
    * per-partition row count is segments-per-doc (⌈len/L⌉+1-ish),
    * never corpus-shaped, so no viral-key skew class exists here. */
  def composeTranslations(t01: DataFrame, t12: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = t01.select(col("doc_id"), col("old_bin_id"), col("old_bin_off"),
      col("new_bin_id").as("mid_bin_id"),
      col("new_bin_off").as("__moa"), col("span_len").as("__la"))
    val b = t12.select(col("doc_id"),
      col("old_bin_id").as("mid_bin_id"), col("old_bin_off").as("__mob"),
      col("new_bin_id"), col("new_bin_off"), col("span_len").as("__lb"))
    val inter = a.join(b, Seq("doc_id", "mid_bin_id"))
      .filter(col("__moa") < col("__mob") + col("__lb") &&
        col("__mob") < col("__moa") + col("__la"))
      .withColumn("__s", greatest(col("__moa"), col("__mob")))
      .withColumn("__e",
        least(col("__moa") + col("__la"), col("__mob") + col("__lb")))
      .select(col("doc_id"), col("old_bin_id"),
        (col("old_bin_off") + col("__s") - col("__moa")).as("old_bin_off"),
        col("new_bin_id"),
        (col("new_bin_off") + col("__s") - col("__mob")).as("new_bin_off"),
        (col("__e") - col("__s")).as("span_len"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("old_bin_id"), col("old_bin_off"))
    val contiguous =
      (lag(col("old_bin_id"), 1).over(w) === col("old_bin_id")) &&
      (lag(col("old_bin_off") + col("span_len"), 1).over(w) ===
        col("old_bin_off")) &&
      (lag(col("new_bin_id"), 1).over(w) === col("new_bin_id")) &&
      (lag(col("new_bin_off") + col("span_len"), 1).over(w) ===
        col("new_bin_off"))
    inter
      .withColumn("__brk", when(contiguous, 0).otherwise(1))
      .withColumn("__isl", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("old_bin_id")).as("old_bin_id"),
        min(col("old_bin_off")).as("old_bin_off"),
        min(col("new_bin_id")).as("new_bin_id"),
        min(col("new_bin_off")).as("new_bin_off"),
        sum(col("span_len")).as("span_len"))
      .drop("__isl")
  }

  /** The scheduled reaper: refuse to run below the declared threshold
    * (rolling over a barely-tombstoned corpus wastes a full repack and
    * forces every consumer through a pointless re-key). `ledger` is
    * the generation's takedown ledger; fails loud with the measured
    * fraction so the scheduling decision is diagnosable. */
  def rolloverIfDue(map: DataFrame, ledger: DataFrame,
                    deletedIds: DataFrame, L: Int,
                    thresholdPpm: Long = ThresholdPpm)
      : (DataFrame, DataFrame) = {
    val ppm = deadFractionPpm(ledger)
    require(ppm >= thresholdPpm,
      s"rollover not due: dead fraction ${ppm} ppm < threshold " +
        s"${thresholdPpm} ppm - keep serving tombstones")
    rollover(map, deletedIds, L)
  }
}
