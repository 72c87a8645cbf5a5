package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Distributed Unigram-LM tokenizer (SURVEY.md §2.11a N47/N47b) — the
  * THIRD tokenizer family (Kudo '18, the SentencePiece algorithm),
  * completing the triad the packing algebra claims to be agnostic
  * over: BPE replays merges, WordPiece greedy-matches, Unigram-LM
  * segments by VITERBI best likelihood and trains by PRUNING a seed
  * vocabulary instead of growing one.
  *
  * TRAINING (iterative prune): the seed vocabulary is every substring
  * of corpus words up to `maxPieceLen` chars with its exact occurrence
  * mass (overlapping positions counted, weighted by word frequency —
  * one bounded explode of the Heaps'-law word table). Each piece gets
  * the FROZEN score `freq(u) / total` (one exact BIGINT→DOUBLE cast
  * each and one correctly-rounded IEEE divide — bit-identical
  * cross-engine, q219's argument; scores are never renormalized after
  * pruning, so every round's DP runs on identical doubles in both
  * engines). Each round Viterbi-segments the corpus under the current
  * vocabulary and prunes the `pruneK` length-≥2 pieces with the LOWEST
  * corpus usage (ties by spelling; single characters are never pruned,
  * so encoding stays total). Usage — how many times the best
  * segmentation actually uses the piece, weighted by word frequency —
  * is the exact-integer stand-in for the Kudo likelihood-loss ranking:
  * the true loss is a sum of log-probability deltas, and logs are not
  * hash-reproducible cross-engine, so the prune criterion keeps the
  * integer-evidence discipline (a DECLARED simplification, like
  * q42's lexicon stand-in: the prune-lowest-contribution ALGEBRA is
  * Kudo's, the ranking statistic is the exact one). The deviation
  * BOUNDARY is spec-pinned (UnigramLmSpec "DECLARED DEVIATION"):
  * Kudo ranks by usage × per-use log advantage, the stand-in by
  * usage alone — they order identically while per-use advantages
  * are comparable and diverge exactly when a rarely-used piece is
  * load-bearing (no good fallback) while a frequently-used piece is
  * redundant; the spec holds a fixture where the two argmins differ.
  *
  * ENCODING (Viterbi, exact): the suffix DP
  * `suf(pos) = max over pieces u matching at pos of sc(u)·suf(pos+|u|)`
  * runs as Bellman rounds over the distinct-word position table —
  * every product is built RIGHT-TO-LEFT in both engines, and IEEE
  * multiplication is correctly rounded, so the DP table is
  * bit-identical cross-engine; the best segmentation is then walked
  * left-to-right with q220's bounded join-walk device, stepping on the
  * deterministic argmax piece (`sc(u)·suf(pos+|u|) = suf(pos)`, ties
  * longest-then-lexicographic). Equality on identically-computed
  * doubles is engine-consistent, so the walk — and with it the piece
  * counts AND the per-piece usage — hash-matches the DuckDB twin.
  *
  * Scale shape: one corpus pass to the word table; the seed explode,
  * match table, DP rounds and walk all run over the DISTINCT-word
  * table (Heaps: ~√corpus) with positions bounded by max word length;
  * the match table is `maxPieceLen` equi-joins on the substring key
  * (never a crossJoin — the vocabulary stays distributed); the corpus
  * only ever joins the finished `(w, n_up)` table on the word key
  * (q195/q220's posture). Driver-side collects: the 1-row max word
  * length, the 1-row score total, and the `pruneK`-row prune set per
  * round — all in the sanctioned reduced-aggregate class.
  */
object UnigramLm {

  /** One pruned piece with its exact evidence. */
  final case class Pruned(round: Int, spell: String, usage: Long, freq: Long)

  /** Seed pieces `(spell, sl, freq)`: every substring of length
    * 1..maxPieceLen, mass = corpus occurrences (overlapping counted,
    * word-frequency weighted). */
  def seedPieces(words: DataFrame, maxPieceLen: Int): DataFrame =
    (1 to maxPieceLen).map { l =>
      words.filter(length(col("w")) >= l)
        .select(col("freq"), explode(expr(
          s"transform(sequence(1, length(w) - $l + 1), " +
            s"i -> substring(w, i, $l))")).as("spell"))
    }.reduce(_ unionByName _)
      .groupBy(col("spell"))
      .agg(sum(col("freq")).as("freq"))
      .withColumn("sl", length(col("spell")).cast("int"))

  /** Seed vocabulary with the FROZEN score column `sc = freq / total`
    * (total = the whole seed's mass — never renormalized). */
  def seedVocab(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val seed = seedPieces(words, maxPieceLen)
    val tot = seed.agg(sum(col("freq")).as("__tot"))
    seed.crossJoin(tot) // 1-row constant join (q207's device)
      .select(col("spell"), col("sl"), col("freq"),
        (col("freq").cast("double") / col("__tot").cast("double")).as("sc"))
      .barrier()
  }

  /** Match table `(w, pos, sl, spell, sc)` over the distinct-word
    * position grid: one substring equi-join per piece length. */
  private def matchTable(dw: DataFrame, vocab: DataFrame,
                         maxPieceLen: Int): DataFrame = {
    val pos = dw.select(col("w"),
      explode(sequence(lit(1), col("len"))).as("pos"))
    (1 to maxPieceLen).map { l =>
      pos.select(col("w"), col("pos"),
          expr(s"substring(w, pos, $l)").as("spell"))
        .join(vocab.filter(col("sl") === l)
          .select(col("spell"), col("sl"), col("sc")), Seq("spell"))
        .select(col("w"), col("pos"), col("sl"), col("spell"), col("sc"))
    }.reduce(_ unionByName _)
  }

  /** Bellman suffix DP to convergence: `(w, pos, f)` with
    * `f = suf(pos)` — the best achievable product from pos to the end.
    * `maxLen` rounds (a segmentation has ≤ len pieces). */
  private def suffixDp(dw: DataFrame, m: DataFrame, maxLen: Int): DataFrame = {
    var reached = dw.select(col("w"), (col("len") + 1).as("pos"),
      lit(1.0).as("f"))
    (1 to maxLen).foreach { r =>
      val cand = m.join(reached.select(col("w").as("w2"),
          col("pos").as("npos"), col("f").as("nf")),
          col("w") === col("w2") && (col("pos") + col("sl")) === col("npos"))
        .select(col("w"), col("pos"), (col("sc") * col("nf")).as("f"))
      reached = reached.unionByName(cand)
        .groupBy(col("w"), col("pos")).agg(max(col("f")).as("f"))
      // aggregate-topped, never a bare Union (the r9 bug); barrier
      // every SECOND round — one un-cut round nests a single extra
      // join in the plan (analysis stays linear) and halves the
      // job-count floor that dominates these tiny-state rounds
      if (r % 2 == 0 || r == maxLen) reached = reached.barrier()
    }
    reached
  }

  /** Deterministic best step per `(w, pos)`: the piece achieving
    * `sc·suf(pos+sl) = suf(pos)`, ties longest-then-lexicographic.
    * Double equality is engine-consistent because both sides computed
    * the identical doubles. */
  private def bestStep(m: DataFrame, suf: DataFrame): DataFrame = {
    val withNext = m.join(suf.select(col("w").as("w2"),
        col("pos").as("npos"), col("f").as("nf")),
        col("w") === col("w2") && (col("pos") + col("sl")) === col("npos"))
      .select(col("w"), col("pos"), col("sl"), col("spell"),
        (col("sc") * col("nf")).as("cf"))
    withNext.join(suf, Seq("w", "pos"))
      .filter(col("cf") === col("f"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("w"), col("pos"))
          .orderBy(col("sl").desc, col("spell"))))
      .filter(col("rn") === 1)
      .select(col("w"), col("pos"), col("sl"), col("spell"))
  }

  /** Viterbi walk over the distinct-word table: `(w, n_up, used)` —
    * piece count and the ordered used-piece list (length-bounded).
    * Raises on a stall (impossible while single chars stay in the
    * vocabulary — documented contract, enforced loudly). */
  private def walk(dw: DataFrame, bs: DataFrame, maxLen: Int): DataFrame = {
    var state = dw.select(col("w"), col("len"), lit(1).as("pos"),
      lit(0L).as("n_up"), array().cast("array<string>").as("used"))
    (1 to maxLen).foreach { r =>
      state = state.join(bs, Seq("w", "pos"), "left_outer")
        .select(col("w"), col("len"),
          when(col("sl").isNull, col("pos"))
            .otherwise(col("pos") + col("sl")).as("pos"),
          when(col("sl").isNull, col("n_up"))
            .otherwise(col("n_up") + 1L).as("n_up"),
          when(col("sl").isNull, col("used"))
            .otherwise(concat(col("used"), array(col("spell")))).as("used"))
      // barrier every second round (see suffixDp) — the walk state is
      // distinct-word-sized, so the job floor, not the data, is the cost
      if (r % 2 == 0 || r == maxLen) state = state.barrier()
    }
    state.select(col("w"), col("len"), col("pos"), col("n_up"), col("used"))
      .select(col("w"),
        when(col("pos") <= col("len"),
          raise_error(concat(
            lit("UnigramLm Viterbi stalled (out-of-vocabulary): word '"),
            col("w"), lit("' has no piece at position "),
            col("pos").cast("string"))))
          .otherwise(col("n_up")).as("n_up"),
        col("used"))
  }

  /** Per-distinct-word Viterbi piece counts and used pieces under
    * `vocab`: `(w, n_up, used)`. */
  def viterbiSegments(words: DataFrame, vocab: DataFrame,
                      maxPieceLen: Int): DataFrame = {
    val dw = words.select(col("w")).distinct()
      .withColumn("len", length(col("w")).cast("int"))
    val maxLen = dw.agg(coalesce(max(col("len")), lit(0))).head().getInt(0)
    val m = matchTable(dw, vocab, maxPieceLen).barrier()
    val suf = suffixDp(dw, m, maxLen)
    walk(dw, bestStep(m, suf).barrier(), maxLen)
  }

  /** Corpus-weighted per-piece Viterbi usage under `vocab`. */
  def viterbiUsage(words: DataFrame, vocab: DataFrame,
                   maxPieceLen: Int): DataFrame =
    viterbiSegments(words, vocab, maxPieceLen)
      .select(col("w"), explode(col("used")).as("spell"))
      .join(words.select(col("w"), col("freq")), Seq("w"))
      .groupBy(col("spell"))
      .agg(sum(col("freq")).as("usage"))

  /** `rounds` usage-ranked prune rounds over the seed vocabulary.
    * Returns the pruned evidence and the surviving vocabulary. */
  def train(words: DataFrame, maxPieceLen: Int, rounds: Int,
            pruneK: Int): (Seq[Pruned], DataFrame) = {
    var vocab = seedVocab(words, maxPieceLen)
    val pruned = Seq.newBuilder[Pruned]
    (1 to rounds).foreach { r =>
      val usage = viterbiUsage(words, vocab, maxPieceLen)
      val bottom = vocab.filter(col("sl") >= 2)
        .join(usage, Seq("spell"), "left_outer")
        .select(col("spell"), col("freq"),
          coalesce(col("usage"), lit(0L)).as("usage"))
        .orderBy(col("usage"), col("spell"))
        .limit(pruneK)
        .collect() // pruneK rows — the per-round argmin (BpeVocab's device)
      pruned ++= bottom.map(row =>
        Pruned(r, row.getString(0), row.getLong(2), row.getLong(1)))
      val drop = bottom.map(_.getString(0)).toSeq
      vocab = vocab.filter(!col("spell").isin(drop: _*)).barrier()
    }
    (pruned.result(), vocab)
  }
}
