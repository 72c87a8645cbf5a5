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

  /** Language-ID marker profiles: (lang, token, weight). The n-gram
    * heuristic needs per-language frequency profiles; with a synthetic
    * shared-vocabulary corpus the profiles are fixture-declared rather
    * than corpus-learned — the OPERATOR (weighted profile match +
    * argmax) is what carries to real corpora. */
  val langProfiles: Seq[(String, String, Int)] = Seq(
    ("en", "the", 3), ("en", "a", 2), ("en", "row", 1),
    ("es", "data", 2), ("es", "query", 2), ("es", "line", 1),
    ("zh", "table", 2), ("zh", "window", 2), ("zh", "key", 1),
    ("de", "scan", 2), ("de", "merge", 2), ("de", "sort", 1),
    ("fr", "value", 2), ("fr", "part", 2), ("fr", "group", 1))

  def langProfilesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    langProfiles.toDF("plang", "token", "weight")
  }

  val langProfilesSql: String =
    langProfiles.map { case (l, t, w) => s"('$l', '$t', $w)" }
      .mkString("(VALUES ", ", ", ") prof(plang, token, weight)")

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

  /** Blocklist for the safety gate (q203) — drawn from the corpus
    * vocabulary so the oracle row exercises real hits. */
  val blocklist: Seq[String] = Seq("slow", "dup")

  def blocklistDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    blocklist.toDF("bterm")
  }

  val blocklistSql: String =
    blocklist.map(t => s"('$t')")
      .mkString("(VALUES ", ", ", ") bl(bterm)")

  /** Leet-speak fold shared by both engines' `translate`:
    * digits/symbols that commonly substitute letters. */
  val leetFrom = "013457@$"
  val leetTo   = "oleastas"
}
