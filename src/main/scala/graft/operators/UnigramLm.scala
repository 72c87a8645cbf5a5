package graft.operators

import org.apache.spark.sql.DataFrame
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
  * runs PER WORD as one catalyst `aggregate` over the word's own
  * match list (r18 — the DP and walk used to run as ~2·maxLen Bellman
  * join+aggregate rounds over a (w, pos) table; same values, same
  * fixpoint, a fraction of the jobs — see [[segmentExpr]]) — every
  * product is built RIGHT-TO-LEFT in both engines, and IEEE
  * multiplication is correctly rounded, so the DP table is
  * bit-identical cross-engine; the best segmentation is then walked
  * left-to-right in the same aggregate, stepping on the deterministic
  * argmax piece (`sc(u)·suf(pos+|u|) = suf(pos)`, ties
  * longest-then-lexicographic). Equality on identically-computed
  * doubles is engine-consistent, so the walk — and with it the piece
  * counts AND the per-piece usage — hash-matches the DuckDB twin
  * (whose CTEs still unroll the Bellman rounds — the two formulations
  * reach the identical table; the equivalence argument is on
  * [[segmentExpr]]).
  *
  * Scale shape: one corpus pass to the word table; the seed explode,
  * match table and per-word DP all run over the DISTINCT-word table
  * (Heaps: ~√corpus) with positions bounded by max word length; the
  * match table is one substring equi-join over the (pos, len) grid
  * (never a crossJoin — the vocabulary stays distributed); the corpus
  * only ever joins the finished `(w, n_up)` table on the word key
  * (q195/q220's posture). Driver-side collects: the 1-row score total
  * and the `pruneK`-row prune set per round — all in the sanctioned
  * reduced-aggregate class.
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
    * position grid: ONE substring equi-join for all piece lengths
    * (r18 optimization — was one join + union per length; the (pos,
    * sl) grid is exploded first and `substring(w, pos, sl)` has exact
    * length sl by construction, so a vocabulary piece can only match
    * the grid row of its own length — sl needs no explicit equality). */
  private def matchTable(dw: DataFrame, vocab: DataFrame,
                         maxPieceLen: Int): DataFrame =
    dw.select(col("w"), col("len"),
        explode(sequence(lit(1), col("len"))).as("pos"))
      .select(col("w"), col("pos"), explode(sequence(lit(1),
        least(lit(maxPieceLen), col("len") - col("pos") + 1))).as("sl"))
      .select(col("w"), col("pos"), col("sl"),
        expr("substring(w, pos, sl)").as("spell"))
      .join(vocab.select(col("spell"), col("sc")), Seq("spell"))
      .select(col("w"), col("pos"), col("sl"), col("spell"), col("sc"))

  /** The per-word Viterbi: suffix DP + deterministic walk, collapsed
    * into ONE catalyst `aggregate` over the word's own match list
    * (r18 optimization; was ~2·maxLen Bellman join+aggregate rounds
    * with a localCheckpoint every second round — the job-count floor
    * that dominated q235–q237; see OPTIMIZATION_r18.md).
    *
    * Iterations 1..len build `suf` RIGHT-TO-LEFT (iteration i fills
    * position len−i+1): suf(pos) = max over pieces at pos with
    * reachable suf(pos+sl) of sc·suf(pos+sl), null = unreachable.
    * Every candidate is the identical right-associated IEEE product
    * the Bellman rounds built (stale partial values there were always
    * ≤ the final ones and the final products were regenerated each
    * round, so the round max equals this direct DP — same doubles,
    * same max set), keeping the cross-engine bit-identity argument.
    * Iterations len+1..2·len walk LEFT-TO-RIGHT on the finished suf:
    * at pos the step piece is the (sl DESC, spell ASC)-least match
    * with sc·suf(pos+sl) = suf(pos) (struct-min on (−sl, spell) — the
    * exact tie rule the old row_number used); a position with no
    * qualifying piece stalls (pos stays put) and raises after the
    * loop, the documented out-of-vocabulary contract.
    *
    * The walk reads `suf` ONLY through the aggregate's accumulator —
    * the one structure projection collapse cannot inline — so the DP
    * is computed exactly once per word (the assignPR lesson: HOFs are
    * interpreted and naively chaining suf → walk as separate columns
    * re-evaluates the whole DP per walk candidate). Per-word cost is
    * O(len² + len·|matches|) scalar ops on ≤ UgDpRounds-char words —
    * trivia next to one Spark job, and it runs over the DISTINCT-word
    * table (Heaps: ~√corpus), embarrassingly parallel. */
  private def segmentExpr: org.apache.spark.sql.Column = expr("""
    aggregate(
      sequence(1, len + len),
      named_struct(
        'suf', concat(array_repeat(CAST(NULL AS DOUBLE), len),
                      array(CAST(1.0 AS DOUBLE))),
        'pos', 1, 'n', CAST(0 AS BIGINT),
        'used', CAST(array() AS array<string>)),
      (st, i) -> IF(i <= len,
        named_struct(
          'suf', transform(st.suf, (v, j) ->
            IF(j + 1 = len - i + 1,
               array_max(transform(
                 filter(ms, m -> m.pos = len - i + 1
                   AND element_at(st.suf, m.pos + m.sl) IS NOT NULL),
                 m -> m.sc * element_at(st.suf, m.pos + m.sl))),
               v)),
          'pos', st.pos, 'n', st.n, 'used', st.used),
        IF(st.pos > len
             OR size(filter(ms, m -> m.pos = st.pos
                 AND element_at(st.suf, m.pos + m.sl) IS NOT NULL
                 AND m.sc * element_at(st.suf, m.pos + m.sl)
                     = element_at(st.suf, st.pos))) = 0,
           st,
           named_struct(
             'suf', st.suf,
             'pos', st.pos + array_min(transform(
               filter(ms, m -> m.pos = st.pos
                 AND element_at(st.suf, m.pos + m.sl) IS NOT NULL
                 AND m.sc * element_at(st.suf, m.pos + m.sl)
                     = element_at(st.suf, st.pos)),
               m -> named_struct('nsl', -m.sl, 'spell', m.spell))).nsl * -1,
             'n', st.n + CAST(1 AS BIGINT),
             'used', concat(st.used, array(array_min(transform(
               filter(ms, m -> m.pos = st.pos
                 AND element_at(st.suf, m.pos + m.sl) IS NOT NULL
                 AND m.sc * element_at(st.suf, m.pos + m.sl)
                     = element_at(st.suf, st.pos)),
               m -> named_struct('nsl', -m.sl, 'spell', m.spell))).spell))))))
  """)

  /** Per-distinct-word Viterbi piece counts and used pieces under
    * `vocab`: `(w, n_up, used)`. */
  def viterbiSegments(words: DataFrame, vocab: DataFrame,
                      maxPieceLen: Int): DataFrame = {
    val dw = words.select(col("w")).distinct()
      .withColumn("len", length(col("w")).cast("int"))
    val perWord = matchTable(dw, vocab, maxPieceLen)
      .groupBy(col("w"))
      .agg(sort_array(collect_list(
        struct(col("pos"), col("sl"), col("spell"), col("sc")))).as("ms"))
    dw.join(perWord, Seq("w"), "left_outer")
      .select(col("w"), col("len"),
        coalesce(col("ms"), array().cast(
          "array<struct<pos:int,sl:int,spell:string,sc:double>>")).as("ms"))
      .select(col("w"), col("len"), segmentExpr.as("seg"))
      .select(col("w"),
        when(col("seg.pos") <= col("len"),
          raise_error(concat(
            lit("UnigramLm Viterbi stalled (out-of-vocabulary): word '"),
            col("w"), lit("' has no piece at position "),
            col("seg.pos").cast("string"))))
          .otherwise(col("seg.n")).as("n_up"),
        col("seg.used").as("used"))
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
