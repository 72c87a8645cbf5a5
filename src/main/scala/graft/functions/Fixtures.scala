package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic NLP fixture tables (FIXTURES.md §C) replacing the
  * reference's pretrained models (reference README.md:57-61) with
  * seed-free relational inputs — the same capability class (sentiment,
  * NER) but reproducible and DuckDB-oracle-checkable.
  *
  * One source of truth per fixture: the Seq below renders to BOTH the
  * Spark DataFrame and the DuckDB `VALUES` SQL, so the two engines can
  * never drift. Terms are drawn from the documents-table vocabulary.
  */
object Fixtures {

  /** AFINN-style sentiment lexicon: term -> integer valence. */
  val sentimentLexicon: Seq[(String, Int)] = Seq(
    "fast" -> 3, "merge" -> 2, "big" -> 1, "value" -> 1,
    "slow" -> -3, "dup" -> -2, "small" -> -1, "scan" -> -1)

  /** Gazetteer: phrase -> entity tag (the NER stand-in). */
  val gazetteer: Seq[(String, String)] = Seq(
    "spark" -> "ORG", "customer" -> "PERSON",
    "window" -> "LOC", "table" -> "LOC")

  /** Per-language stopword lists for the lexicon-overlap language scorer. */
  val stopwords: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en")

  def lexiconDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sentimentLexicon.toDF("term", "score")
  }

  def gazetteerDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    gazetteer.toDF("phrase", "tag")
  }

  /** DuckDB twin: `(VALUES ('fast',3),...) lex(term, score)`. */
  val lexiconSql: String =
    sentimentLexicon.map { case (t, s) => s"('$t', $s)" }
      .mkString("(VALUES ", ", ", ") lex(term, score)")

  val gazetteerSql: String =
    gazetteer.map { case (p, t) => s"('$p', '$t')" }
      .mkString("(VALUES ", ", ", ") gaz(phrase, tag)")
}
