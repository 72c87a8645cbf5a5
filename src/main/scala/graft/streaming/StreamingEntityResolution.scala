package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Streaming entity-resolution assignment (SURVEY.md §2.9 T22 — the
  * r9→r11 verdict item): new records arriving on a stream probe a
  * FROZEN Ed-Join gram index of the already-resolved corpus, verify
  * with the exact edit distance, and either ADOPT the matched golden
  * id or MINT their own — the q212 golden-record operator's streaming
  * twin (batch trains/freezes, the stream scores: the T14–T21
  * posture).
  *
  * Probe losslessness versus the frozen corpus (EdJoin's window
  * theorem, re-derived for the one-directional case): for any pair
  * (delta d, frozen f) within edit distance τ, whichever side has
  * ≥ τ·q+1 positional windows owns an UNTOUCHED window that survives
  * verbatim in the other, displaced ≤ τ positions. If d is long, its
  * surviving window is in the frozen index; if f is long, its
  * surviving window is a q-substring of d — and the stream probes with
  * ALL of d's windows (a micro-batch is small; the batch operator's
  * τ·q+1-prefix pruning is an optimization the delta side doesn't
  * need), so the banded equi-join finds it either way. Pairs where
  * BOTH sides are short (< τ·q+1 windows) go through the explicit
  * short-class fallback against the frozen short table. Every
  * candidate is levenshtein-verified, so blocking cannot change an
  * assignment.
  *
  * RETENTION / RECONCILIATION CAVEAT (the documented contract): the
  * index is FROZEN — minted records are NOT added to it, so (a) two
  * streamed records near each other but far from the corpus each mint
  * their own id, and (b) a streamed record bridging two frozen
  * clusters adopts the smaller golden id without merging them. Both
  * are the inherent price of O(|delta|) assignment with bounded state;
  * the lambda posture reconciles them at the next batch re-freeze
  * (re-run q212 on the union — StreamingSpec T22 pins streamed ==
  * batch-on-union exactly when deltas neither bridge nor cluster among
  * themselves, the construction production dedup relies on). State is
  * bounded by the frozen corpus (index + strings + golden map), never
  * by stream length.
  *
  * Scale: freeze cost = one EdJoin + labelStar over the corpus (the
  * batch job that exists anyway) + barriered index tables; per batch,
  * the delta explodes to ~Σ len windows, equi-joins the gram index
  * (band-limited fan-out), verifies candidates only, and aggregates
  * min golden per record — no corpus rescan, no state growth.
  */
object StreamingEntityResolution {

  /** Frozen side: gram inverted index, short-class strings, corpus
    * strings for verify, and the resolved golden map — all barriered
    * so micro-batch plans never re-derive them. */
  final case class ErState(index: DataFrame, shorts: DataFrame,
                           strings: DataFrame, golden: DataFrame,
                           tau: Int, q: Int)

  /** Resolve the batch corpus (id, nm) with q212's EdJoin+labelStar
    * composition and freeze the probe-side tables. */
  def freeze(corpus: DataFrame, idCol: String, strCol: String,
             tau: Int, q: Int): ErState = {
    val c = corpus.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))
    val pairs = graft.operators.EdJoin.join(c, "__id", "__s", tau, q)
    val comps = graft.operators.ConnectedComponents
      .labelStar(c.select(col("__id")), "__id", pairs, "a_id", "b_id")
    val golden = comps
      .select(col("__id"), col("component").as("__golden")).barrier()
    val grams = windows(c, q)
      .select(col("__id").as("i_id"), col("__len").as("i_len"),
        col("__pos").as("i_pos"), col("__g").as("i_g")).barrier()
    val shorts = c
      .filter(greatest(col("__len") - (q - 1), lit(1)) <= tau * q)
      .barrier()
    ErState(grams, shorts, c.barrier(), golden, tau, q)
  }

  /** Positional q-gram windows (__id, __len, __pos, __g) — EdJoin's
    * enumeration: `len−q+1` windows, a string shorter than q is its
    * own single window. */
  private def windows(s: DataFrame, q: Int): DataFrame =
    s.select(col("__id"), col("__len"),
      posexplode(expr(
        s"transform(sequence(1, greatest(__len - ${q - 1}, 1)), " +
          s"i -> substring(__s, i, $q))")).as(Seq("__p0", "__g")))
      .select(col("__id"), col("__len"), (col("__p0") + 1).as("__pos"),
        col("__g"))

  /** Assign one micro-batch of (id, nm) records against the frozen
    * state: `(id, golden, matched)` — `golden` is the smallest golden
    * id among verified frozen matches (deterministic), or the record's
    * own id when nothing matches (minted; `matched` = 0). */
  def assignBatch(state: ErState, delta: DataFrame,
                  idCol: String, strCol: String): DataFrame = {
    val tau = state.tau; val q = state.q
    val d = delta.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))
    // banded index probe with ALL delta windows (lossless one-way —
    // see the object scaladoc), canonical candidate = (delta, frozen)
    val probed = windows(d, q)
      .select(col("__id").as("d_id"), col("__len").as("d_len"),
        col("__pos").as("d_pos"), col("__g"))
      .join(state.index,
        col("__g") === col("i_g") &&
          abs(col("d_pos") - col("i_pos")) <= tau &&
          abs(col("d_len") - col("i_len")) <= tau)
      .select(col("d_id"), col("i_id")).distinct()
    // short-short fallback: a dist-τ short pair can share no window
    val shortD = d.filter(greatest(col("__len") - (q - 1), lit(1)) <= tau * q)
    val shortPairs = shortD
      .select(col("__id").as("d_id"), col("__len").as("d_len"))
      .join(state.shorts.select(col("__id").as("i_id"),
        col("__len").as("i_len")),
        abs(col("d_len") - col("i_len")) <= tau)
      .select(col("d_id"), col("i_id"))
    val verified = probed.unionByName(shortPairs).distinct()
      .join(d.select(col("__id").as("d_id"), col("__s").as("__sd")), "d_id")
      .join(state.strings.select(col("__id").as("i_id"), col("__s").as("__si")),
        "i_id")
      .filter(levenshtein(col("__sd"), col("__si")) <= tau)
      .join(state.golden.select(col("__id").as("i_id"), col("__golden")),
        "i_id")
      .groupBy(col("d_id"))
      .agg(min(col("__golden")).as("__adopt"))
    d.join(verified, col("__id") === col("d_id"), "left_outer")
      .select(col("__id").as(idCol),
        coalesce(col("__adopt"), col("__id")).as("golden"),
        col("__adopt").isNotNull.cast("int").as("matched"))
  }
}
