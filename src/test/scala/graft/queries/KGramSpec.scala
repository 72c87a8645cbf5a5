package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X111d / N15b pins — the two candidate-generation devices behind
  * q284 (k-gram wildcard) and q285 (SymSpell fuzzy resolution), each
  * with the failure its post-filter exists to kill:
  *
  *  - k-gram: gram containment is necessary, NOT sufficient — the
  *    textbook `red*` → `retired` false positive survives the gram
  *    intersection and only the LIKE post-filter removes it.
  *  - deletion-join: a shared single-deletion variant admits
  *    Levenshtein-distance-2 pairs (`abc`/`bca` share `bc`) and the
  *    exact `levenshtein <= 1` verify is what keeps them out; all
  *    three edit directions (sub/del/ins) and the exact match ride
  *    the same join.
  *  - resolution prior: among equal-distance candidates the corpus-
  *    frequency tiebreak picks the more frequent term.
  */
class KGramSpec extends SparkSpecBase {
  import spark.implicits._

  private def grams(term: String): Set[String] = {
    val p = "$" + term + "$"
    (0 until p.length - 1).map(i => p.substring(i, i + 2)).toSet
  }

  test("kgram: red* candidates include the retired false positive; LIKE kills it") {
    val vocab = Seq("red", "retired", "redo", "blue")
    val patGrams = Set("$r", "re", "ed") // bigrams of $red (prefix-only pattern)
    val cands = vocab.filter(t => patGrams.subsetOf(grams(t)))
    assert(cands.toSet == Set("red", "retired", "redo"),
      "gram intersection must admit the FP — that is the textbook point")
    val matched = cands.filter(_.startsWith("red"))
    assert(matched.toSet == Set("red", "redo"))
  }

  test("deletion join admits a distance-2 pair; the levenshtein verify kills it") {
    def del1(s: String): Set[String] =
      Set(s) ++ (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
    // abc / bca share variant bc but sit at Levenshtein distance 2
    assert(del1("abc").intersect(del1("bca")).nonEmpty)
    val vocab = Seq(("bca", 5L)).toDF("term", "tf_total")
    val probe = Seq("abc").toDF("probe")
    def variants(c: String) = expr(
      s"""array_union(array($c), transform(sequence(1, length($c)),
          i -> concat(substring($c, 1, i - 1),
                      substring($c, i + 1, length($c)))))""")
    val joined = probe.select($"probe", explode(variants("probe")).as("v"))
      .join(vocab.select($"term", explode(variants("term")).as("v")), "v")
      .select($"probe", $"term").distinct()
    assert(joined.count() == 1, "the del-join must admit the d2 pair")
    assert(joined.withColumn("lev", levenshtein($"probe", $"term"))
      .filter($"lev" <= 1).count() == 0, "the verify must kill it")
  }

  test("all three edit directions and the exact match ride the del-join") {
    def del1(s: String): Set[String] =
      Set(s) ++ (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
    // sub: sparc/spark, del: stram/stream, ins: querry/query, exact: window
    for ((p, t) <- Seq(("sparc", "spark"), ("stram", "stream"),
        ("querry", "query"), ("window", "window"))) {
      assert(del1(p).intersect(del1(t)).nonEmpty, s"$p should reach $t")
    }
  }

  test("resolution prefers lower distance, then higher corpus frequency") {
    // probe 'cot': 'cat' (tf 100) and 'cut' (tf 7) both at distance 1 —
    // frequency decides; 'cot' itself absent so distance 0 can't win.
    val docs = Seq(
      (0L, (Seq.fill(100)("cat") ++ Seq.fill(7)("cut")).mkString(" ")))
      .toDF("doc_id", "text")
    val tf = docs.select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("tf_total"))
    def variants(c: String) = expr(
      s"""array_union(array($c), transform(sequence(1, length($c)),
          i -> concat(substring($c, 1, i - 1),
                      substring($c, i + 1, length($c)))))""")
    val res = Seq("cot").toDF("probe")
      .select($"probe", explode(variants("probe")).as("v"))
      .join(tf.select($"term", $"tf_total", explode(variants("term")).as("v")), "v")
      .select($"probe", $"term", $"tf_total").distinct()
      .withColumn("lev", levenshtein($"probe", $"term"))
      .filter($"lev" <= 1)
      .groupBy($"probe")
      .agg(min_by(struct($"term", $"lev", $"tf_total"),
        struct($"lev", -$"tf_total", $"term")).as("r"))
      .select($"r.term").collect().map(_.getString(0))
    assert(res.toSeq == Seq("cat"))
  }
}
