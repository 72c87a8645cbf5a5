package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language model with stupid backoff (SURVEY.md §2.11a N43;
  * Brants et al. '07) — the perplexity-filter capability class under
  * the library's no-log/no-float determinism contract. Train counts in
  * batch over a reference split, score documents by the exact-ppm
  * ARITHMETIC mean of per-position conditionals:
  *
  *   score(w1,w2) = 10⁶·c(w1,w2) DIV c(w1·)   if the bigram was seen
  *                = 0.4 · 10⁶·c(w2) DIV N      else if w2 was seen
  *                = 0                           else (OOV)
  *
  * (0.4 is Brants' penalty, exact as ·400000.) The same [[score]]
  * plan serves batch (q207) and streaming (T19): the LM tables join
  * stream-static per micro-batch — the production posture of every
  * frozen-model gate here (T17 weights, T18 codebooks): retrain
  * periodically in batch, score continuously, never let the filter's
  * statistics drift with the stream it filters.
  *
  * Scale: two value-domain-sized count aggregates (bigram, head) + one
  * unigram aggregate on the train side; scoring is three unhinted
  * equi-joins on token keys (AQE broadcasts the LM while it fits — at
  * web scale a bigram table outgrows executors and the joins shuffle
  * tokens, never raw text) plus one per-document aggregate. The token
  * total N rides as a 1-row frame equi-joined on a constant key, so
  * building the plan is action-free and the same device is legal in a
  * stream-static join (cross joins are not).
  */
object BigramLm {

  /** LM count frames: bigram (bw1, bw2, cb), head (hw1, ch), unigram
    * (uw, cu), and the 1-row token total (n). CACHE these before
    * streaming against them — Spark re-plans the static side of a
    * stream-static join every micro-batch. */
  final case class Lm(bg: DataFrame, hd: DataFrame, uni: DataFrame, nn: DataFrame) {
    def cache(): Lm = { Seq(bg, hd, uni, nn).foreach(_.cache()); this }
    def unpersist(): Unit = Seq(bg, hd, uni, nn).foreach { f =>
      f.unpersist(): Unit
    }
  }

  /** `(idCol, w1, w2)` — consecutive token pairs per document; tokens
    * are whitespace-split with empties dropped (the q197/q199/BPE
    * posture), documents with fewer than two tokens contribute none. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        filter(split(col(textCol), " "), t => length(t) > 0).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Train the count tables over `docs` (the reference split). */
  def train(docs: DataFrame, idCol: String, textCol: String): Lm = {
    val big = bigrams(docs, idCol, textCol)
    val toks = docs
      .select(explode(filter(split(col(textCol), " "),
        t => length(t) > 0)).as("w"))
    Lm(
      bg = big.groupBy(col("w1").as("bw1"), col("w2").as("bw2"))
        .agg(count(lit(1)).as("cb")),
      hd = big.groupBy(col("w1").as("hw1")).agg(count(lit(1)).as("ch")),
      uni = toks.groupBy(col("w").as("uw")).agg(count(lit(1)).as("cu")),
      nn = toks.agg(count(lit(1)).as("n")))
  }

  /** Per-document coherence report over a bigram frame (batch or
    * streaming): `(idCol, n_big, coherence_ppm, backoff_ppm,
    * oov_ppm)`. In a streaming plan this is an UPDATE-mode aggregate —
    * one small state row per in-flight document. */
  def score(big: DataFrame, idCol: String, lm: Lm): DataFrame =
    big
      .join(lm.bg, col("w1") === col("bw1") && col("w2") === col("bw2"),
        "left_outer")
      .join(lm.hd, col("w1") === col("hw1"), "left_outer")
      .join(lm.uni, col("w2") === col("uw"), "left_outer")
      .withColumn("__one", lit(1))
      .join(lm.nn.withColumn("__one", lit(1)), "__one")
      .select(col(idCol),
        // counts are corpus-scale (cb/ch/cu/n ~10¹³ at 100 TB), so the
        // ×10⁶ ppm step runs in DECIMAL(38,0) — exact, floored back to
        // BIGINT by div (GenerationRollover.deadFractionPpm's contract)
        when(col("cb").isNotNull,
            expr("(cast(cb as decimal(38,0)) * 1000000) div ch"))
          .otherwise(coalesce(
            expr("(cast(cu as decimal(38,0)) * 400000) div n"), lit(0L)))
          .as("score"),
        col("cb").isNull.as("backoff"),
        (col("cb").isNull && col("cu").isNull).as("oov"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_big"), sum(col("score")).as("ss"),
        sum(when(col("backoff"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("no"))
      .select(col(idCol), col("n_big"),
        expr("ss div n_big").as("coherence_ppm"),
        expr("(cast(nb as decimal(38,0)) * 1000000) div n_big")
          .as("backoff_ppm"),
        expr("(cast(no as decimal(38,0)) * 1000000) div n_big")
          .as("oov_ppm"))
}
