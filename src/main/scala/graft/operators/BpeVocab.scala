package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Barriers._

/** Distributed BPE vocabulary induction (SURVEY.md §2.11a N37) —
  * Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
  * with Subword Units" (ACL 2016): the tokenizer-training step of every
  * LLM data pipeline. Classic BPE trains on the WORD-FREQUENCY table,
  * not the raw corpus: one corpus pass builds (word, freq), then each
  * merge round (1) counts adjacent symbol pairs weighted by word
  * frequency, (2) picks the globally most frequent pair, (3) merges
  * every occurrence. That factoring is exactly the scale shape — the
  * 100 TB corpus is scanned ONCE; the iterative part runs over the
  * distinct-word table (Heaps' law: ~√corpus), each round one
  * map-side-combined pair count plus a single-row driver collect (the
  * sanctioned reduced-aggregate collect) plus a zero-shuffle projection
  * applying the merge.
  *
  * Determinism device — fixed-width hashed symbols: every symbol
  * (single char or merged unit) is represented by the 8-hex-char md5
  * prefix of its spelling, and a word's state is the concatenation
  * `SEP+sym` per symbol (SEP = U+001F, never in hex). Because symbols
  * are FIXED WIDTH, the string `SEP+a+SEP+b` can only match at a
  * symbol boundary and always spans exactly one adjacent pair, so the
  * merge step is plain `replace()` — whose leftmost-nonoverlapping,
  * continue-after-replacement semantics IS BPE's greedy merge order
  * ("aaa" + pair (a,a) → "(aa)a") and is identical in Spark and DuckDB.
  * The merged symbol's id is md5(a_hex || b_hex) — new fixed-width id,
  * closed under iteration. Pair-count ties break (count DESC, a ASC,
  * b ASC): bit-identical vocabularies on any engine or partitioning.
  *
  * Vocabulary-size scaling: each merge is one Spark job, so a
  * production 32k-merge vocabulary is 32k sequential jobs — inherent
  * to EXACT greedy BPE (each round's argmax depends on the last
  * merge). Standard practice bounds the iterative table instead of
  * the round count: train on the word-frequency table with a minimum
  * frequency floor (one `filter(freq >= f)` on [[wordTable]]'s
  * output — Zipf puts most distinct words below any floor, and
  * sub-floor words cannot influence early merges much), or on a
  * corpus sample; the corpus-sized pass stays single either way.
  */
object BpeVocab {

  val Sep = "\u001f"

  /** One learned merge: pair (a, b) → merged, with its support. */
  final case class Merge(round: Int, a: String, b: String,
                         merged: String, cnt: Long)

  /** (w, freq, repr): word-frequency table with each word's initial
    * symbol string — one corpus pass, the only corpus-sized stage. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(w) > 0)
      .groupBy(w).agg(count(lit(1)).as("freq"))
      .withColumn("repr",
        concat_ws("", transform(sequence(lit(1), length(w)),
          i => concat(lit(Sep), substring(md5(w.substr(i, lit(1))), 1, 8)))))
  }

  private def md5hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Symbol array of the current state (split on SEP; drop the leading
    * empty field the SEP-prefixed encoding produces). */
  def syms(repr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(repr, Sep), s => length(s) > 0)

  /** Run `rounds` merge rounds over a word table. Returns the learned
    * merges and the final word table (w, freq, repr). Stops early if
    * the corpus runs out of pairs. */
  def train(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var wf = words.barrier()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = wf
        .select(col("freq"), syms(col("repr")).as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("freq"),
          slice(col("sy"), lit(1), size(col("sy")) - 1).as("s1"),
          slice(col("sy"), lit(2), size(col("sy")) - 1).as("s2"))
        .select(col("freq"), explode(arrays_zip(col("s1"), col("s2"))).as("p"))
        .groupBy(col("p.s1").as("a"), col("p.s2").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // ONE row — the round's argmax pair
      top.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          val merged = md5hex8(a + b)
          merges += Merge(r, a, b, merged, cnt)
          // zero-shuffle projection; checkpoint keeps the round plans flat
          wf = wf.withColumn("repr",
            replace(col("repr"), lit(Sep + a + Sep + b), lit(Sep + merged)))
            .barrier()
          r += 1
      }
    }
    (merges.result(), wf)
  }

  /** The merges as a DataFrame (round, a, b, merged, cnt). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
