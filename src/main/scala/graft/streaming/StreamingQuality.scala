package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Streaming side of the classifier-based quality gate (SURVEY.md
  * §2.9 T17 / §2.11a N38): weights train in BATCH
  * ([[QualityClassifier.trainWeights]] over the curated reference
  * corpus), and the live document stream scores against the FROZEN
  * table — the production deployment pattern (retrain periodically,
  * score continuously; a filter whose weights drift with the stream
  * it filters would gate on its own output).
  *
  * Shape: tokenize per row (stateless), stream-static inner join to
  * the weight table on the token key (Spark re-plans the static side
  * per micro-batch; the weight table is Heaps'-law-sized and
  * broadcast-able), then a per-document sum — a streaming aggregation
  * whose state is one long per in-flight document, emitted in UPDATE
  * mode (a document's score is complete once its tokens' batch is
  * processed; documents are assumed to arrive whole, one row each,
  * so every score finalizes within its batch).
  */
object StreamingQuality {

  /** (idCol, score) updates for a streaming (idCol, textCol) frame
    * against a static weight table (t, wc). CACHE the weight table
    * before passing it in: Spark re-plans the static side of a
    * stream-static join every micro-batch, so an uncached weights
    * frame would re-run its whole training lineage per batch. */
  def scoreStream(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .join(weights, "t")
      .groupBy(col(idCol))
      .agg(sum(col("wc")).as("score"))
}
