package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.BigramLm

/** Streaming side of the bigram-LM coherence gate (SURVEY.md §2.9 T19
  * / §2.11a N43): the LM counts train in BATCH
  * ([[BigramLm.train]] over the reference split) and the live document
  * stream scores against the FROZEN tables — the same
  * retrain-periodically / score-continuously posture as T17 (frozen
  * classifier weights) and T18 (frozen PQ codebooks). A fluency filter
  * whose counts drifted with the stream it filters would converge on
  * whatever it lets through.
  *
  * Shape: stateless per-row bigram projection, three stream-static
  * left joins to the frozen count tables plus the constant-key N join
  * (cross joins are illegal in streaming; the constant-key equi-join
  * is not), then an UPDATE-mode per-document aggregate — one small
  * state row per in-flight document, exactly T17's state posture, so
  * the T17 restart pin covers this aggregate shape too. CACHE the Lm
  * before starting the query: Spark re-plans the static side every
  * micro-batch, and an uncached Lm would re-run its whole training
  * lineage per batch.
  */
object StreamingCoherence {

  /** `(idCol, n_big, coherence_ppm, backoff_ppm, oov_ppm)` updates for
    * a streaming `(idCol, textCol)` frame against a frozen [[BigramLm.Lm]].
    * Documents are assumed to arrive whole (one row each), so a
    * document's report finalizes within its batch. */
  def scoreStream(docs: DataFrame, idCol: String, textCol: String,
                  lm: BigramLm.Lm): DataFrame =
    BigramLm.score(BigramLm.bigrams(docs, idCol, textCol), idCol, lm)
}
