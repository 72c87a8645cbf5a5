package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ProductQuantizer (q193) and BpeVocab (q194/q195) semantics on hand
  * fixtures and the sf0.001 corpus — exact cross-engine outputs are
  * the DuckDB oracle's job; these pin the operator CONTRACTS: code
  * shape, ADC identity on an exact duplicate, recall floor, BPE greedy
  * merge order, determinism under repartition, early-stop. */
class PqBpeSpec extends SparkSpecBase {

  // ---------- ProductQuantizer ----------

  private def pqParts(k: Int = 4) = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val sub = ProductQuantizer.subVectors(emb, "vec_id", "embedding", 8, 8)
      .persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k, rounds = 2)
    (emb, sub, cents)
  }

  test("codes: one per subspace, values within [0, k)") {
    val (_, sub, cents) = pqParts()
    val codes = ProductQuantizer.encode(sub, "vec_id", cents).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 8)
      assert(cs.forall(c => c >= 0 && c < 4))
    }
    sub.unpersist()
  }

  test("ADC ranks an exact duplicate of the query first, at distance 0") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // plant vec 9001 = copy of vec 0 (the query): identical subvectors
    // quantize to identical codes, so every ADC term is the query's own
    // centroid distance — the minimum any vector can achieve
    val clone = emb.filter($"vec_id" === 0)
      .select(lit(9001L).as("vec_id"), $"embedding", $"label")
    val all = emb.unionByName(clone)
    val sub = ProductQuantizer.subVectors(all, "vec_id", "embedding", 8, 8)
      .persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", 4, 2)
    val codes = ProductQuantizer.encode(sub, "vec_id", cents)
    val top = ProductQuantizer
      .adcTopK(codes, "vec_id", sub.filter($"vec_id" === 0), "vec_id",
        cents, m = 8, k = 4, topK = 3)
      .filter($"q_id" === 0 && $"rn" === 1).collect()
    sub.unpersist()
    assert(top.length === 1)
    assert(top.head.getLong(2) === 9001L)
    // clone's codes == query's codes -> adist == query's own ADC
    // residual (sum of its per-sub centroid distances); with itself
    // excluded the clone is the argmin
  }

  test("ADC distortion shrinks as the codebook grows; ADC top-10 beats " +
    "the corpus mean by a wide margin") {
    val s = spark
    import s.implicits._
    // The synthetic embeddings' pairwise distances concentrate tightly
    // (mean |ADC−true| ≈ 0.3–0.4× the mean distance at these tiny
    // codebooks), so recall@10 against the exact top-10 is noise-bound
    // — the contracts that ARE stable: (1) mean absolute ADC error is
    // monotone ↓ in k (4 → 16: measured 82.6M → 58.3M on this corpus);
    // (2) the vectors ADC ranks top-10 have true distances well below
    // the corpus mean (the code orders genuinely near things first).
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val vq = emb.select($"vec_id", KMeansInt.quantize($"embedding").as("xq"))
    val q = vq.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"xq".as("qx"))
    val truth = vq.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .withColumn("d", KMeansInt.sqDist($"xq", $"qx"))
      .select($"q_id", $"vec_id", $"d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val meanTrue = truth.values.map(_.toDouble).sum / truth.size
    val errByK = Seq(4, 16).map { k =>
      val sub = ProductQuantizer.subVectors(emb, "vec_id", "embedding", 8, 8)
        .persist()
      val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k, rounds = 2)
      val codes = ProductQuantizer.encode(sub, "vec_id", cents)
      val adcAll = ProductQuantizer.adcTopK(codes, "vec_id",
          sub.filter($"vec_id" < 3), "vec_id", cents, m = 8, k = k, topK = 499)
        .select($"q_id", $"rn", $"vec_id", $"adist").collect()
      sub.unpersist()
      val top10True = adcAll.filter(_.getInt(1) <= 10)
        .map(r => truth((r.getLong(0), r.getLong(2))).toDouble)
      // (2): ADC's chosen neighbors are genuinely near
      // measured ≈ 0.78× (k=4) / 0.82× (k=16) of the corpus mean; a
      // random pick concentrates at ~1.0× — 0.9 is the stable bound
      assert(top10True.sum / top10True.length < 0.9 * meanTrue,
        s"k=$k: ADC top-10 not closer than corpus mean")
      adcAll.map(r => math.abs(
        r.getLong(3).toDouble - truth((r.getLong(0), r.getLong(2))))).sum
    }
    // (1): more codes, less distortion
    assert(errByK(1) < errByK(0),
      s"distortion not monotone in k: ${errByK.mkString(" vs ")}")
  }

  test("ADC scoring is one projection + one bounded aggregate: a single " +
    "exchange, no join, after the codes table") {
    val s = spark
    import s.implicits._
    val (_, sub, cents) = pqParts()
    // materialize codes so the scoring plan starts at the stored table
    // (what a 100 TB deployment reads), not at the training lineage
    val codes = ProductQuantizer.encode(sub, "vec_id", cents).localCheckpoint()
    val out = ProductQuantizer.adcTopK(codes, "vec_id",
      sub.filter($"vec_id" < 3), "vec_id", cents, 8, 4, 5)
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"ADC should shuffle once (the top-k partial agg):\n$p")
    assert(!p.contains("Join"), s"ADC scoring must not join:\n$p")
    sub.unpersist()
  }

  test("IVF-PQ with nProbe = k equals full-corpus ADC (pruning skips, " +
    "never rescores)") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (coarse, coarseCents) =
      KMeansInt.clusterWithCents(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val sub = ProductQuantizer.subVectors(emb, "vec_id", "embedding", 8, 8)
      .persist()
    val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", 4, 2)
    val codes = ProductQuantizer.encode(sub, "vec_id", cents).persist()
    val qSub = sub.filter($"vec_id" < 3)
    val full = ProductQuantizer
      .adcTopK(codes, "vec_id", qSub, "vec_id", cents, 8, 4, 5)
      .orderBy($"q_id", $"rn").collect().toSeq
    // the q196 composition at nProbe = 8 (= every cell)
    val qv = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), KMeansInt.quantize($"embedding").as("qx"))
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"__d", $"cluster")
    val probes = qv.crossJoin(broadcast(coarseCents))
      .withColumn("__d", KMeansInt.sqDist($"qx", $"cq"))
      .withColumn("__rn", row_number().over(wP)).filter($"__rn" <= 8)
      .select($"q_id", $"cluster".as("cell"))
    val cand = coarse.select($"vec_id", $"cluster".as("cell"))
      .join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"q_id").select($"q_id", $"vec_id")
    val luts = ProductQuantizer.buildLuts(qSub, "vec_id", cents, 8, 4)
    val scored = cand.join(codes, "vec_id")
      .select($"q_id", $"vec_id",
        ProductQuantizer.adcExpr(luts, $"q_id", $"codes", 8, 4).as("adist"))
    val ivf = ProductQuantizer.boundedTopK(scored, "vec_id", 5)
      .orderBy($"q_id", $"rn").collect().toSeq
    assert(ivf === full)
    sub.unpersist(); codes.unpersist()
  }

  test("IVFADC residual encoding cuts ADC distortion vs global-codebook " +
    "PQ on the same probed candidates (clustered corpus)") {
    val s = spark
    import s.implicits._
    // On the STRUCTURELESS sf corpus residuals don't help (coarse
    // cells are noise there; measured 3.81e10 vs 3.57e10 — slightly
    // WORSE): the residual claim is about data with cluster structure,
    // the data IVF is FOR — the IvfAnnSpec precedent. 8 tight clusters,
    // radius ≪ inter-center distance.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, 64)(rnd.nextFloat() - 0.5f)
    val emb = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      (i, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f).toSeq)
    }.toDF("vec_id", "embedding")
    val vq = emb.select($"vec_id", KMeansInt.quantize($"embedding").as("xq"))
    val qv = vq.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"xq".as("qx"))
    val truth = vq.crossJoin(broadcast(qv)).filter($"vec_id" =!= $"q_id")
      .withColumn("d", KMeansInt.sqDist($"xq", $"qx"))
      .select($"q_id", $"vec_id", $"d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (coarse, coarseCents) =
      KMeansInt.clusterWithCents(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"__d", $"cluster")
    val probes = qv.crossJoin(broadcast(coarseCents))
      .withColumn("__d", KMeansInt.sqDist($"qx", $"cq"))
      .withColumn("__rn", row_number().over(wP)).filter($"__rn" <= 2)
      .select($"q_id", $"cluster".as("cell"))
    val cand = coarse.select($"vec_id", $"cluster".as("cell"))
      .join(broadcast(probes), "cell").filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"cell", $"vec_id").persist()
    // (a) global-codebook PQ over the candidates
    val sub = ProductQuantizer.subVectors(emb, "vec_id", "embedding", 8, 8)
      .persist()
    val gc = ProductQuantizer.trainCodebooks(sub, "vec_id", 4, 2)
    val gcodes = ProductQuantizer.encode(sub, "vec_id", gc)
    val gluts = ProductQuantizer.buildLuts(
      sub.filter($"vec_id" < 4).withColumnRenamed("vec_id", "q_id"),
      "q_id", gc, 8, 4)
    val gErr = cand.join(gcodes, "vec_id")
      .select($"q_id", $"vec_id",
        ProductQuantizer.adcExpr(gluts, $"q_id", $"codes", 8, 4).as("adist"))
      .collect().map(r => math.abs(
        r.getLong(2).toDouble - truth((r.getLong(0), r.getLong(1))))).sum
    // (b) residual codebooks, per-cell query LUTs
    val rv = ProductQuantizer.residuals(emb, "vec_id", "embedding",
      coarse, coarseCents)
    val rsub = ProductQuantizer
      .subVectorsQ(rv.select($"vec_id", $"xq"), "vec_id", 8, 8).persist()
    val rc = ProductQuantizer.trainCodebooks(rsub, "vec_id", 4, 2)
    val rcodes = ProductQuantizer.encode(rsub, "vec_id", rc)
    val qr = probes.join(qv, "q_id")
      .join(broadcast(coarseCents.select($"cluster".as("cell"), $"cq")), "cell")
      .select(($"q_id" * 1024 + $"cell").as("qc"),
        zip_with($"qx", $"cq", (x, c) => x - c + lit(20000L)).as("xq"))
    val rluts = ProductQuantizer.buildLuts(
      ProductQuantizer.subVectorsQ(qr, "qc", 8, 8), "qc", rc, 8, 4)
    val rErr = cand.join(rcodes, "vec_id")
      .select($"q_id", $"vec_id",
        ProductQuantizer.adcExpr(rluts, $"q_id" * 1024 + $"cell", $"codes", 8, 4)
          .as("adist"))
      .collect().map(r => math.abs(
        r.getLong(2).toDouble - truth((r.getLong(0), r.getLong(1))))).sum
    sub.unpersist(); rsub.unpersist(); cand.unpersist()
    assert(rErr < gErr,
      s"residual encoding did not reduce distortion: $rErr vs $gErr")
  }

  test("JL projection preserves pairwise squared distances in " +
    "expectation (ratio ~ dOut) and is shift-invariant") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" < 30)
    val rows = emb
      .select($"vec_id", KMeansInt.quantize($"embedding").as("xq"),
        RandomProjection.project(KMeansInt.quantize($"embedding"), 16, 64).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray))
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => val z = (x - y).toDouble; z * z }.sum
    val ratios = for {
      i <- rows.indices; j <- rows.indices if i < j
    } yield d2(rows(i)._3, rows(j)._3) / d2(rows(i)._2, rows(j)._2)
    val mean = ratios.sum / ratios.size
    // E[ratio] = dOut = 16 for a ±1 matrix; the mean over 435 pairs
    // concentrates well inside [10, 22]
    assert(mean > 10 && mean < 22, s"JL mean ratio $mean")
    // the grid's +10^4 shift cancels in differences: projecting the
    // UNSHIFTED grid must give identical pairwise distances
    val unshifted = emb.select($"vec_id",
        RandomProjection.project(
          transform(KMeansInt.quantize($"embedding"), _ - 10000L), 16, 64).as("y"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val shifted = rows.map(r => r._1 -> r._3).toMap
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val (a, b) = (rows(i)._1, rows(j)._1)
      assert(d2(shifted(a), shifted(b)) === d2(unshifted(a), unshifted(b)))
    }
  }

  // ---------- BpeVocab ----------

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def md5hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  test("BPE greedy merge: leftmost-nonoverlapping inside a run (aaa)") {
    val wt = BpeVocab.wordTable(docs(1L -> "aaa"), "text")
    val (merges, fin) = BpeVocab.train(wt, 1)
    assert(merges.length === 1)
    val m = merges.head
    assert(m.a === md5hex8("a") && m.b === md5hex8("a"))
    assert(m.merged === md5hex8(md5hex8("a") + md5hex8("a")))
    // "aaa" -> (aa) a : two symbols survive
    val ns = fin.select(size(BpeVocab.syms(col("repr")))).collect().head.getInt(0)
    assert(ns === 2)
  }

  test("BPE picks the globally most frequent pair, weighted by word freq") {
    // "xy" occurs in 3 word instances, "ab" in 2 -> round 1 merges (x,y)
    val wt = BpeVocab.wordTable(
      docs(1L -> "xy xy ab", 2L -> "xy ab"), "text")
    val (merges, _) = BpeVocab.train(wt, 1)
    assert(merges.head.a === md5hex8("x") && merges.head.b === md5hex8("y"))
    assert(merges.head.cnt === 3L)
  }

  test("BPE merges are iteration-closed: a merged pair can merge again") {
    // freq("ab")=4 in "abab"x2 -> round1 (a,b); round2 the dominant pair
    // is (ab, ab) inside "abab" -> a second-order symbol
    val wt = BpeVocab.wordTable(docs(1L -> "abab abab ab"), "text")
    val (merges, _) = BpeVocab.train(wt, 2)
    val ab = md5hex8(md5hex8("a") + md5hex8("b"))
    assert(merges(0).merged === ab)
    assert(merges(1).a === ab && merges(1).b === ab)
  }

  test("BPE stops early when no pairs remain; determinism under repartition") {
    val (none, _) = BpeVocab.train(
      BpeVocab.wordTable(docs(1L -> "a b c"), "text"), 5)
    assert(none.isEmpty) // all words single-char: zero pairs
    val base = docs(1L -> "hello world hello", 2L -> "world of words")
    val a = BpeVocab.train(BpeVocab.wordTable(base, "text"), 4)._1
    val b = BpeVocab.train(BpeVocab.wordTable(base.repartition(7), "text"), 4)._1
    assert(a === b)
  }

  test("marked WordPiece: the ## marker is LOAD-BEARING — marked and " +
    "unmarked training learn different merge tables on the same corpus, " +
    "and the marked encode obeys the positional rule exactly") {
    val spk = spark
    import spk.implicits._
    val docs = graft.core.Tables(spk, sf, "documents")
      .select($"doc_id", $"text")
    val un = WordPieceVocab.train(
      BpeVocab.wordTable(docs, "text"), 4)._1
    val mkWords = WordPieceVocab.markedWordTable(docs, "text")
    val mk = WordPieceVocab.train(mkWords, 4)._1
    assert(un.map(m => (m.a, m.b)) !== mk.map(m => (m.a, m.b)),
      "position marking changed nothing — the alphabet split is cosmetic")
    // positional rule: replaying MaxMatch in plain Scala against the
    // class-split vocabulary must reproduce the operator's counts
    val vocab = WordPieceVocab.markedVocabSpellings(mkWords, mk)
    val initial = vocab.filter(!_._2).map(_._1).toSet
    val contin = vocab.filter(_._2).map(_._1).toSet
    def walk(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val cls = if (pos == 0) initial else contin
        val L = (w.length - pos).to(1, -1)
          .find(l => cls(w.substring(pos, pos + l))).getOrElse(
            sys.error(s"stalled at $w:$pos"))
        pos += L; n += 1
      }
      n
    }
    val got = WordPieceVocab.markedWordPieceCounts(mkWords, vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (w, n) =>
      assert(n === walk(w), s"word '$w': operator $n != replay ${walk(w)}")
    }
    assert(got.nonEmpty)
  }

  test("WordPiece MaxMatch fails LOUDLY on an out-of-vocabulary stall " +
    "instead of emitting a partial count (r12 ADVICE)") {
    val spk = spark
    import spk.implicits._
    val words = BpeVocab.wordTable(docs(1L -> "abc ab"), "text")
    // vocab missing 'c': the walk on "abc" consumes "ab" then stalls
    val ex = intercept[Exception] {
      WordPieceVocab.wordPieceCounts(words, Seq("ab", "a", "b")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("stalled")),
      s"expected a stall error, got: ${ex.getMessage}")
    // complete vocab: same corpus finishes with exact counts
    val ok = WordPieceVocab.wordPieceCounts(words, Seq("ab", "a", "b", "c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ok === Map("abc" -> 2L, "ab" -> 1L))
  }
}
