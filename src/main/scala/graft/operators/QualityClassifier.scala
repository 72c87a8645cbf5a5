package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering (SURVEY.md §2.11a N38) — the
  * model-based selection gate of the GPT-3 / CCNet / FineWeb lineage
  * (Brown et al. '20 app. A; Wenzek et al. '20): train a linear
  * classifier to separate a "high-quality" reference class from the
  * rest, score every document, keep the high scorers. Production uses
  * logistic regression / fastText over hashed n-grams; the learning
  * step here is a Naive-Bayes-style LIKELIHOOD-RATIO table — the same
  * shape (per-token weights, additive document score), chosen because
  * it trains in ONE aggregate pass and carries no float log-loss
  * optimizer whose summation order could differ across engines.
  *
  * Log-free determinism (the q147-lift / q157-TV / q122-Gini device):
  * NB scores are Σ log-ratios; logs cannot hash-match across libm
  * builds, so the weight is the add-1-smoothed ratio itself in ppm,
  * CENTERED at zero —
  *
  *   wc(t) = (10⁶·(np+1)·(Nn+V)) DIV ((nn+1)·(Np+V)) − 10⁶
  *
  * (np/nn = class token counts, Np/Nn = class totals, V = vocabulary)
  * and the document score is Σ wc(t) over its tokens: positive-leaning
  * tokens push above 0, negative below — a monotone surrogate of the
  * NB posterior ordering for balanced evidence, exact BIGINT
  * end-to-end. All DIV operands are positive (Spark `div` truncates
  * toward zero, DuckDB `//` floors; they agree on non-negatives).
  *
  * Overflow bound (ADVICE r8; closed r15): the raw BIGINT numerator
  * 10⁶·(np+1)·(Nn+V) would leave one BIGINT once np_max·(Nn+V) ≥
  * 2⁶³/10⁶ ≈ 9.2·10¹² — a common token in a 10⁸-token class already
  * crosses it (ANSI mode throws, non-ANSI wraps silently), and the
  * 100 TB design point (~10¹⁴-token classes) is far past it. The
  * ratio therefore runs in DECIMAL(38,0): worst case
  * 10⁶·10¹⁴·(10¹⁴+V) ≈ 10³⁴ < 10³⁸, every intermediate exact, and
  * the quotient is floored back to BIGINT by `div` — bit-identical
  * to the old BIGINT path wherever that path didn't overflow.
  *
  * Scale shape: training is one corpus pass → (token, np, nn) with
  * map-side partial counts (viral tokens absorb into combiners), one
  * 1-row totals aggregate broadcast back; scoring joins the corpus
  * token stream to the Heaps'-law-sized weight table on the token key
  * and sums per document. Raw text never shuffles — only (doc, token
  * hash-join rows, wc longs).
  */
object QualityClassifier {

  /** (idCol, pos, t): the labeled token stream — one corpus pass. */
  def tokenTable(docs: DataFrame, idCol: String, textCol: String,
                 posLabel: Column): DataFrame =
    docs.select(col(idCol), posLabel.as("pos"),
        explode(split(col(textCol), " ")).as("t"))
      .filter(length(col("t")) > 0)

  /** Learned weight table (t, wc) — centered smoothed ppm ratios. */
  def trainWeights(tok: DataFrame): DataFrame = {
    val cnt = tok.groupBy(col("t"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    val tot = cnt.agg(sum(col("np")).as("tnp"), sum(col("nn")).as("tnn"),
      count(lit(1)).as("v"))
    weightsFrom(cnt, tot)
  }

  /** Weight arithmetic over precomputed per-token counts `cnt(t, np,
    * nn)` and the 1-row totals `tot(tnp, tnn, v)` — split out of
    * [[trainWeights]] so the DECIMAL(38,0) overflow contract is
    * directly testable with synthetic corpus-scale counts (the spec
    * feeds ~2⁵⁰-per-token / ~2⁶²-total fixtures no test corpus could
    * produce by counting). */
  def weightsFrom(cnt: DataFrame, tot: DataFrame): DataFrame =
    cnt.crossJoin(broadcast(tot))
      .select(col("t"),
        (expr("(1000000 * (cast(np as decimal(38,0)) + 1) * (tnn + v)) " +
          "div ((cast(nn as decimal(38,0)) + 1) * (tnp + v))")
          - 1000000L).as("wc"))

  /** Per-document additive score: (idCol, score). Tokens outside the
    * weight table contribute nothing (inner join) — in-corpus scoring
    * always finds every token; for out-of-corpus inference left-join
    * and coalesce to the smoothed unseen-token constant. */
  def score(tok: DataFrame, idCol: String, weights: DataFrame): DataFrame =
    tok.join(weights, "t")
      .groupBy(col(idCol))
      .agg(sum(col("wc")).as("score"))
}
