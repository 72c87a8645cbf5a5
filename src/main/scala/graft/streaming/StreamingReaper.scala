package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._
import graft.operators.GenerationRollover

/** Streaming REAPER (SURVEY.md §2.9 T29): generation rollover driven
  * by the live takedown stream — the q245/q246 batch reaper's
  * streaming member, closing the family the same way T21/T23 close
  * the append side and T26 closes the delete side.
  *
  * Per micro-batch, the T26 takedown discipline runs first (dedup
  * against accumulated tombstones so at-least-once delivery degrades
  * to exactly-once ledger arithmetic; per-bin freed increments from
  * the delta's map rows only; tombstone union compacted every
  * [[StreamingTakedown.CompactEvery]] batches). Then the reaper's
  * scheduling check: [[GenerationRollover.deadFractionPpm]] over the
  * updated ledger (one 1-row aggregate per batch — the sanctioned
  * reduced-aggregate class; this IS the poll a production reaper runs
  * on its metrics store). Crossing the threshold fires the rollover
  * MID-STREAM: survivors repack into generation G+1 via generation
  * G's own seg_len arithmetic, the old→new (bin, offset) translation
  * map is appended to the generation CHAIN, and the state re-freezes
  * — new all-live ledger, empty tombstone set, generation counter
  * bumped. Takedowns arriving after the roll tombstone G+1 rows; a
  * REPLAYED request for a doc reaped in an earlier generation is a
  * structural no-op (the doc has no rows in the current map, so its
  * ledger increment is zero rows and its tombstone never matches a
  * survivor — exactly-once semantics survive generation boundaries
  * without any cross-generation dedup state).
  *
  * Dataloaders holding generation-G references re-key through the
  * chain: [[rekeyChain]] folds the per-hop covering-span lookup
  * (q251's join shape — equi-join on the old bin + bounded residual
  * range predicate) over the accumulated translations. Span
  * composition is exact at token grain, so the chain of G0→G1→…→Gn
  * lookups lands every surviving token on the SAME final (bin,
  * offset) as the single-shot G0→Gn translation — and a probe on a
  * token whose doc was reaped at ANY generation drops at exactly the
  * hop after its deletion, the dataloader's skip semantics. Both laws
  * are spec-pinned (StreamingSpec T29): after a forced final roll,
  * the serving map equals `GenerationRollover.rollover(map0, union of
  * ALL deltas)` — generation-count independence — and the chained
  * re-key equals the single-shot re-key probe for probe.
  *
  * Scale: everything per batch is O(|delta| + bins); the rollover
  * itself is the q245 shape (anti-join + per-doc aggregate + the
  * q209 PrefixScan packing — the only corpus-map-sized work, paid
  * exactly when a quarter of the corpus is dead, not per batch).
  *
  * The chain is BOUNDED in-stream (r15 — the r14 verdict's "no
  * in-stream translation-chain collapse"): past [[HopBudget]]
  * translation frames, [[roll]] folds the oldest two hops into one
  * with [[GenerationRollover.composeTranslations]] (q254 — composed ≡
  * single-shot direct, row for row), so a long-lived stream crossing
  * the threshold many times never makes a re-key pay more than
  * HopBudget covering-span hops. The collapse costs ONE q254 compose
  * per roll past the budget (spans-per-doc-bounded join + window —
  * the same shape the roll itself already pays), never per batch, and
  * composition exactness means the bounded chain re-keys IDENTICALLY
  * to the unbounded one and to the single-shot direct translation —
  * all three pinned mid-stream in StreamingSpec T29b.
  */
object StreamingReaper {

  /** Declared per-lookup hop budget: the serving chain never holds
    * more than this many translation frames — a dataloader re-key
    * pays at most this many covering-span joins no matter how many
    * generations have rolled. 2 keeps the steady state at "one
    * composed prefix + the freshest hop" while still exercising real
    * chains; pass a different budget (or Int.MaxValue for an
    * unbounded chain) to [[applyBatch]]/[[roll]]. */
  val HopBudget = 2

  final case class RpState(map: DataFrame, tombstones: DataFrame,
                           ledger: DataFrame, generation: Int,
                           translations: List[DataFrame],
                           batches: Int = 0)

  private def emptyIds(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
  }

  private def freshLedger(map: DataFrame): DataFrame =
    map.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_live"), lit(0L).as("n_freed"),
        sum(col("seg_len")).as("live_tokens"), lit(0L).as("freed_tokens"))
      .barrier()

  /** Freeze generation 0 from a q209 packing map. */
  def freeze(map: DataFrame): RpState = {
    val m = map.barrier()
    RpState(m, emptyIds(m), freshLedger(m), 0, Nil)
  }

  /** Apply one micro-batch of `(doc_id)` takedown requests, then roll
    * the generation if the updated ledger's dead fraction crossed
    * `thresholdPpm` (collapsing the translation chain to `hopBudget`
    * frames when the roll pushes it past). */
  def applyBatch(state: RpState, delta: DataFrame, L: Int,
                 thresholdPpm: Long = GenerationRollover.ThresholdPpm,
                 hopBudget: Int = HopBudget)
      : RpState = {
    // T26's exactly-once discipline: only never-seen ids take effect
    val fresh = delta.select(col(delta.columns.head).cast("long").as("doc_id"))
      .distinct()
      .join(state.tombstones, Seq("doc_id"), "left_anti")
      .barrier()
    val binInc = state.map.join(fresh, Seq("doc_id"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("__df"), sum(col("seg_len")).as("__dt"))
    val ledger = state.ledger.join(binInc, Seq("bin_id"), "left_outer")
      .select(col("bin_id"),
        (col("n_live") - coalesce(col("__df"), lit(0L))).as("n_live"),
        (col("n_freed") + coalesce(col("__df"), lit(0L))).as("n_freed"),
        (col("live_tokens") - coalesce(col("__dt"), lit(0L))).as("live_tokens"),
        (col("freed_tokens") + coalesce(col("__dt"), lit(0L))).as("freed_tokens"))
      .barrier()
    val union = state.tombstones.unionByName(fresh)
    val nBatches = state.batches + 1
    val tombstones =
      if (nBatches % StreamingTakedown.CompactEvery == 0)
        union.distinct().barrier()
      else union
    val applied = RpState(state.map, tombstones, ledger, state.generation,
      state.translations, nBatches)
    // the reaper's poll: one scalar off the bins-sized ledger
    if (GenerationRollover.deadFractionPpm(ledger) >= thresholdPpm)
      roll(applied, L, hopBudget)
    else applied
  }

  /** Roll the generation NOW (the mid-stream trigger path, and the
    * spec's forced final roll): survivors repack, the translation
    * joins the chain — collapsed back to `hopBudget` frames when the
    * append pushes past it — and ledger and tombstones re-freeze
    * all-live. */
  def roll(state: RpState, L: Int, hopBudget: Int = HopBudget): RpState = {
    val (newMap, trans) =
      GenerationRollover.rollover(state.map, state.tombstones, L)
    val chain = collapseToBudget(
      state.translations :+ trans.barrier(), hopBudget)
    RpState(newMap, emptyIds(newMap), freshLedger(newMap),
      state.generation + 1, chain, state.batches)
  }

  /** Fold the OLDEST two hops together until the chain fits the
    * budget (q254's compose — exact, so the bounded chain re-keys
    * identically to the unbounded one). Appending adds one frame per
    * roll, so steady state composes at most once per roll. */
  private def collapseToBudget(chain: List[DataFrame], hopBudget: Int)
      : List[DataFrame] =
    if (chain.lengthCompare(hopBudget) <= 0) chain
    else collapseToBudget(
      GenerationRollover.composeTranslations(chain.head, chain(1))
        .barrier() :: chain.drop(2), hopBudget)

  /** One covering-span lookup hop (q251's join shape): each probe
    * `(probe_id, old_bin_id, old_off)` lands on its next-generation
    * (bin, offset) or drops (freed span — the doc was reaped at this
    * hop). Output keeps the probe key and renames the landing back to
    * the probe columns so hops compose by folding. */
  def rekeyHop(probes: DataFrame, trans: DataFrame): DataFrame =
    probes.alias("p").join(trans.alias("t"),
        col("p.old_bin_id") === col("t.old_bin_id") &&
          col("p.old_off") >= col("t.old_bin_off") &&
          col("p.old_off") < col("t.old_bin_off") + col("t.span_len"))
      .select(col("p.probe_id").as("probe_id"),
        col("t.new_bin_id").as("old_bin_id"),
        (col("t.new_bin_off") + col("p.old_off") - col("t.old_bin_off"))
          .as("old_off"))

  /** Re-key generation-0 probes through the whole accumulated chain.
    * Returns `(probe_id, new_bin_id, new_off)` for probes that
    * survive every hop. */
  def rekeyChain(probes: DataFrame, translations: Seq[DataFrame])
      : DataFrame =
    translations.foldLeft(probes)(rekeyHop)
      .select(col("probe_id"), col("old_bin_id").as("new_bin_id"),
        col("old_off").as("new_off"))
}
