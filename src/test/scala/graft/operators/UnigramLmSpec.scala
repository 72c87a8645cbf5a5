package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins UnigramLm (q235–q237) against a driver-side reference: exact
  * Viterbi optimality, the deterministic tie-broken walk, usage
  * accounting, and the prune invariants. */
class UnigramLmSpec extends SparkSpecBase {

  private val maxPieceLen = 4

  private def docsOf(texts: (Long, String)*) = {
    val s = spark
    import s.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  /** Reference: suffix DP + stepwise walk, mirroring the operator's
    * fold order (products right-to-left) and tie rule (longest, then
    * lexicographic). */
  private def refSegment(w: String, vocab: Map[String, Double])
      : Seq[String] = {
    val n = w.length
    val suf = new Array[Double](n + 2)
    val ok = new Array[Boolean](n + 2)
    suf(n + 1) = 1.0; ok(n + 1) = true
    for (pos <- n to 1 by -1) {
      var best = Double.NegativeInfinity
      var any = false
      for (l <- 1 to math.min(maxPieceLen, n - pos + 1)) {
        val sp = w.substring(pos - 1, pos - 1 + l)
        if (vocab.contains(sp) && ok(pos + l)) {
          val v = vocab(sp) * suf(pos + l)
          if (v > best) { best = v; any = true }
        }
      }
      suf(pos) = best; ok(pos) = any
    }
    require(ok(1), s"reference cannot segment '$w'")
    val out = Seq.newBuilder[String]
    var pos = 1
    while (pos <= n) {
      val cands = (1 to math.min(maxPieceLen, n - pos + 1)).flatMap { l =>
        val sp = w.substring(pos - 1, pos - 1 + l)
        if (vocab.contains(sp) && ok(pos + l) &&
          vocab(sp) * suf(pos + l) == suf(pos)) Some((l, sp)) else None
      }
      // tie rule: longest first, then lexicographically SMALLEST spell
      val chosen = cands.sortBy { case (ll, ss) => (-ll, ss) }.head
      out += chosen._2
      pos += chosen._1
    }
    out.result()
  }

  test("Viterbi segments == reference DP + tie-broken walk on a mixed " +
    "corpus; counts and used lists agree exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4219)
    val wordsList = Seq("aa", "abab", "baba", "aabb", "bbbb", "abba",
      "a", "b", "abababab", "bbaa") ++
      Seq.fill(10)((1 to (1 + rnd.nextInt(8)))
        .map(_ => if (rnd.nextBoolean()) "a" else "b").mkString)
    val docs = docsOf(wordsList.zipWithIndex.map {
      case (w, i) => (i.toLong, s"$w $w ${wordsList(rnd.nextInt(wordsList.size))}")
    }: _*)
    val words = BpeVocab.wordTable(docs, "text")
    val vocabDf = UnigramLm.seedVocab(words, maxPieceLen)
    val vocab = vocabDf.select($"spell", $"sc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = UnigramLm.viterbiSegments(words, vocabDf, maxPieceLen)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[String](2).toList)).toMap
    words.select($"w").distinct().collect().map(_.getString(0)).foreach { w =>
      val want = refSegment(w, vocab)
      assert(got(w)._2 === want, s"segmentation of '$w'")
      assert(got(w)._1 === want.size.toLong, s"count of '$w'")
      assert(want.mkString === w, s"pieces must reassemble '$w'")
    }
  }

  test("usage accounting: viterbiUsage == freq-weighted piece counts of " +
    "the reference segmentations") {
    val s = spark
    import s.implicits._
    val docs = docsOf(1L -> "abab abab bb", 2L -> "bb abba", 3L -> "abab a")
    val words = BpeVocab.wordTable(docs, "text")
    val vocabDf = UnigramLm.seedVocab(words, maxPieceLen)
    val vocab = vocabDf.select($"spell", $"sc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val freqs = words.select($"w", $"freq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = freqs.toSeq.flatMap { case (w, f) =>
      refSegment(w, vocab).map(_ -> f)
    }.groupBy(_._1).map { case (sp, xs) => sp -> xs.map(_._2).sum }
    val got = UnigramLm.viterbiUsage(words, vocabDf, maxPieceLen)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("train prunes exactly the usage-argmin length>=2 pieces per round " +
    "(ties by spelling), never a single character, and the surviving " +
    "vocabulary still segments every corpus word") {
    val s = spark
    import s.implicits._
    val docs = docsOf(1L -> "abab baba aabb aabb bb", 2L -> "abab bb a",
      3L -> "baba baba aa")
    val words = BpeVocab.wordTable(docs, "text")
    val (pruned, vocab) = UnigramLm.train(words, maxPieceLen,
      rounds = 2, pruneK = 3)
    assert(pruned.size === 6)
    assert(pruned.forall(_.spell.length >= 2), "a single char was pruned")
    // round-1 prune set == reference bottom-3 by (usage, spell)
    val seedDf = UnigramLm.seedVocab(words, maxPieceLen)
    val usage1 = UnigramLm.viterbiUsage(words, seedDf, maxPieceLen)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want1 = seedDf.select($"spell", $"sl").collect()
      .filter(_.getInt(1) >= 2).map(_.getString(0))
      .map(sp => (usage1.getOrElse(sp, 0L), sp)).sorted.take(3).map(_._2)
    assert(pruned.filter(_.round == 1).map(_.spell) === want1.toSeq)
    // encode under the pruned vocab must still cover the corpus
    val seg = UnigramLm.viterbiSegments(words, vocab, maxPieceLen)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).mkString)
    seg.foreach { case (w, joined) => assert(joined === w) }
    // and no pruned piece is ever used again
    val prunedSet = pruned.map(_.spell).toSet
    val used2 = UnigramLm.viterbiSegments(words, vocab, maxPieceLen)
      .select(explode($"used").as("sp")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(used2.intersect(prunedSet).isEmpty)
  }

  test("DECLARED DEVIATION pinned: usage-argmin and Kudo's likelihood-loss " +
    "ranking disagree exactly where a rarely-USED piece is load-bearing " +
    "(huge per-use log advantage) while a frequently-used piece is " +
    "redundant (near-equal fallback) — the stand-in prunes the former, " +
    "Kudo the latter") {
    val s = spark
    import s.implicits._
    // corpus: 'ab' x3 with VERY common singles a,b (fallback a·b nearly
    // as good -> tiny per-use advantage, usage 3); 'xy' x1 with rare
    // singles (fallback catastrophic -> per-use advantage ln T, usage 1)
    val docs = docsOf(1L -> "ab ab ab a a a a a b b b b b xy")
    val words = BpeVocab.wordTable(docs, "text")
    // exact seed masses: a=8, b=8, ab=3, x=y=xy=1, T=22
    val T = 22.0
    val sc = Map("a" -> 8 / T, "b" -> 8 / T, "ab" -> 3 / T,
      "x" -> 1 / T, "y" -> 1 / T, "xy" -> 1 / T)
    val ws = Seq(("ab", 3L), ("a", 5L), ("b", 5L), ("xy", 1L))
    def bestProb(w: String, v: Map[String, Double]): Double = {
      val n = w.length
      val suf = new Array[Double](n + 2)
      suf(n + 1) = 1.0
      for (pos <- n to 1 by -1) {
        suf(pos) = (1 to math.min(2, n - pos + 1)).flatMap { l =>
          v.get(w.substring(pos - 1, pos - 1 + l)).map(_ * suf(pos + l))
        }.foldLeft(0.0)(math.max)
      }
      suf(1)
    }
    // both candidates ARE used under the full vocabulary (the
    // disagreement is about ranking, not reachability): sc(ab) = 3/22
    // beats sc(a)*sc(b) = 64/484 by a hair; sc(xy) beats 1/484 by 22x
    assert(sc("ab") > sc("a") * sc("b"))
    assert(sc("xy") > sc("x") * sc("y"))
    def ll(v: Map[String, Double]): Double =
      ws.map { case (w, f) => f * math.log(bestProb(w, v)) }.sum
    val full = ll(sc)
    val deltas = Seq("ab", "xy").map(u => u -> (full - ll(sc - u))).toMap
    // Kudo's criterion: prune the piece whose removal costs the LEAST
    // likelihood — that is 'ab' (3 uses x tiny advantage < 1 use x ln 22)
    assert(deltas("ab") < deltas("xy"),
      s"fixture lost its divergence: $deltas")
    // the stand-in prunes by usage-argmin — that is 'xy' (usage 1 < 3)
    val (pruned, _) = UnigramLm.train(words, maxPieceLen = 2,
      rounds = 1, pruneK = 1)
    assert(pruned.map(p => (p.spell, p.usage)) === Seq(("xy", 1L)),
      "the declared stand-in must prune the lowest-USAGE piece")
    // boundary statement: the two rankings order by usage vs
    // usage x per-use-log-advantage; they agree whenever per-use
    // advantages are comparable and diverge exactly when they are not
  }

  test("every walk product equals the DP optimum (max-product law, not " +
    "just a valid segmentation)") {
    val s = spark
    import s.implicits._
    val docs = docsOf(1L -> "abababab bbaabb ab ba abab",
      2L -> "aabbaabb abab bb")
    val words = BpeVocab.wordTable(docs, "text")
    val vocabDf = UnigramLm.seedVocab(words, maxPieceLen)
    val vocab = vocabDf.select($"spell", $"sc").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    UnigramLm.viterbiSegments(words, vocabDf, maxPieceLen)
      .collect().foreach { r =>
        val w = r.getString(0)
        val pieces = r.getSeq[String](2)
        val walkProd = pieces.foldRight(1.0)((p, acc) => vocab(p) * acc)
        // brute-force best product over ALL segmentations (words short)
        def best(pos: Int): Double =
          if (pos > w.length) 1.0
          else (1 to math.min(maxPieceLen, w.length - pos + 1)).flatMap { l =>
            val sp = w.substring(pos - 1, pos - 1 + l)
            vocab.get(sp).map(sc => sc * best(pos + l))
          }.foldLeft(Double.NegativeInfinity)(math.max)
        assert(walkProd === best(1), s"'$w' walk is not the optimum")
      }
  }
}
