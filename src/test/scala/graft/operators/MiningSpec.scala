package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.queries.Mining

/** Invariants behind the q143–q148 mining family that the differential
  * oracle cannot express: k-core's fixpoint/maximality contract, the
  * decontamination hash device's no-false-positive property, and the
  * bounded-fusion / support-floor contracts.
  */
class MiningSpec extends SparkSpecBase {

  import spark.implicits._

  // path 1-2-3-4-5 peels away entirely under k=2; triangle+tail keeps
  // the triangle: the crafted graph exercises cascade removal
  private def craftedEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),      // path: no 2-core
    (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L) // triangle + pendant 13
  ).toDF("u", "v")

  test("KCore.peel equals the brute-force peel fixpoint on a crafted graph") {
    val core = KCore.peel(craftedEdges, "u", "v", k = 2, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 2-core is exactly the triangle, each member with degree 2 in it
    assert(core === Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
  }

  test("KCore maximality: no removed node has >= k neighbors inside the core " +
    "(otherwise the returned set would not be THE k-core)") {
    val hp = graft.core.Tables(spark, sf, "events")
      .filter($"event_type" === "purchase" && $"user_id" < 100)
      .select(date_trunc("hour", $"ts").as("h"), $"user_id").distinct()
    val edges = hp.as("a").join(hp.as("b"),
        $"a.h" === $"b.h" && $"a.user_id" < $"b.user_id")
      .select($"a.user_id".as("u"), $"b.user_id".as("v")).distinct()
      .persist()
    val core = KCore.peel(edges, "u", "v", k = 3, maxRounds = 6).persist()
    // min-degree contract inside the core
    assert(core.filter($"core_deg" < 3).isEmpty)
    // maximality: count each NON-core node's neighbors that are in the core
    val sym = edges.select($"u".as("a"), $"v".as("b"))
      .unionByName(edges.select($"v".as("a"), $"u".as("b")))
    val intoCore = sym
      .join(core.select($"node".as("b")), Seq("b"))
      .join(core.select($"node".as("a")), Seq("a"), "left_anti")
      .groupBy($"a").agg(count(lit(1)).as("d"))
    assert(intoCore.filter($"d" >= 3).isEmpty,
      "a peeled node still has >= k core neighbors — peel stopped early")
    core.unpersist(); edges.unpersist()
  }

  test("KCore refuses to return a part-peeled set: non-convergence is loud") {
    // path of 9 nodes with k=1... use k=2 on a long path: ends peel off
    // one per round from each side -> needs ~4 rounds; bound at 1
    val path = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(6L,7L),(7L,8L),(8L,9L))
      .toDF("u", "v")
    val e = intercept[IllegalStateException] {
      KCore.peel(path, "u", "v", k = 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("q145's 60-bit gram-hash device admits no false positives at test " +
    "scale: hash-join taint set == raw-string-join taint set") {
    val docs = graft.core.Tables(spark, sf, "documents")
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 5)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks) - 5),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"""))
        .as("gram"))
    val evalG = grams(docs.filter($"source" === "src1")).select($"gram").distinct()
    val stringTaint = grams(docs.filter($"source" =!= "src1"))
      .join(evalG, "gram").select($"doc_id").distinct()
      .as[Long].collect().toSet
    val hashedTaint = Mining.q145.build(spark, sf)
      .filter($"tainted").select($"doc_id").as[Long].collect().toSet
    assert(hashedTaint === stringTaint)
    assert(stringTaint.nonEmpty, "fixture should contain planted 5-gram overlap")
  }

  test("q143 fusion contract: rrf is exactly the sum of the two reciprocal " +
    "ranks, and single-list docs still rank") {
    val rows = Mining.q143.build(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val kwR = Option(r.getAs[Any]("kw_rank")).map(_.asInstanceOf[Int])
      val vecR = Option(r.getAs[Any]("vec_rank")).map(_.asInstanceOf[Int])
      val expected = kwR.map(k => 1000000L / (60 + k)).getOrElse(0L) +
        vecR.map(v => 1000000L / (60 + v)).getOrElse(0L)
      assert(r.getAs[Long]("rrf") === expected)
      assert(kwR.isDefined || vecR.isDefined)
    }
  }

  test("Bfs.distancesPerSource == one Bfs.distances run per seed (tagged " +
    "single-traversal vs k independent traversals)") {
    val edges = craftedEdges
    val nodes = Seq(1L, 10L, 13L)
    val seeds = nodes.map(n => (n, n)).toDF("seed", "node")
    val tagged = Bfs.distancesPerSource(seeds, "seed", "node",
        edges, "u", "v", maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perSeed = nodes.flatMap { n =>
      Bfs.distances(Seq(n).toDF("node"), "node", edges, "u", "v", maxHops = 4)
        .collect().map(r => (n, r.getLong(0)) -> r.getLong(1))
    }.toMap
    assert(tagged === perSeed)
    // sanity: the path component is invisible from the triangle component
    assert(!tagged.contains((10L, 1L)))
  }

  test("q150's summary-derived exact median equals the brute-force per-source " +
    "median of token counts") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"source", size(split($"text", " ")).as("ntok"))
    val brute = docs.collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        val sorted = rows.map(_.getInt(1)).sorted
        // lower median: smallest x with 2*rank(x) >= n
        src -> sorted((sorted.length - 1) / 2)
      }
    val fromQuery = Mining.q150.build(spark, sf)
      .select($"source", $"p50_tokens")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(fromQuery === brute)
  }

  test("q151's hashed overlap matrix equals the raw-string-gram matrix") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val grams = docs
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 5)
      .select($"source", explode(expr(
        """transform(sequence(0, size(toks) - 5),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"""))
        .as("gram"))
      .distinct()
    val brute = grams.as("a").join(grams.as("b"),
        $"a.gram" === $"b.gram" && $"a.source" < $"b.source")
      .groupBy($"a.source", $"b.source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val hashed = Mining.q151.build(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hashed === brute)
  }

  test("TrustRank: trust reaches only seed-connected components, seeds " +
    "outrank distant nodes, and ranks are partitioning-invariant") {
    // two components: triangle containing seed 1; path 10-11-12 with no seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val trust = PageRank.trustMicro(nodes, "id", edges, "u", "v", seeds, "id", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the seedless component gets EXACTLY zero — no uniform teleport leaks in
    assert(Seq(10L, 11L, 12L).forall(trust(_) === 0L), trust.toString)
    assert(trust(1L) > trust(2L), trust.toString) // seed keeps the teleport
    assert(trust(2L) === trust(3L)) // symmetric non-seeds tie exactly
    val re = PageRank.trustMicro(nodes.repartition(5), "id",
        edges.repartition(3), "u", "v", seeds, "id", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === trust) // exact integer arithmetic: bit-equal anywhere
  }

  test("q153's RA scores equal a brute-force common-neighbor computation") {
    val rows = graft.queries.Mining.q153.build(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the graph exactly as the query does, in local Scala
    val hp = graft.core.Tables(spark, sf, "events")
      .filter($"event_type" === "purchase" && $"user_id" < 100)
      .select(date_trunc("hour", $"ts").as("h"), $"user_id")
      .distinct().collect().map(r => (r.get(0), r.getLong(1)))
    val edges = hp.groupBy(_._1).values.flatMap { g =>
      val us = g.map(_._2).sorted
      for (i <- us.indices; j <- i + 1 until us.length) yield (us(i), us(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    for (r <- rows) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(!edges.contains((a, b)), s"($a,$b) already adjacent")
      val common = nbrs(a) intersect nbrs(b)
      assert(r.getAs[Long]("n_common") === common.size)
      assert(r.getAs[Long]("ra_micro") ===
        common.toSeq.map(z => 1000000L / nbrs(z).size).sum)
    }
  }

  test("q154 quintiles satisfy the ntile contract: sizes differ by at most " +
    "one and larger measure values never land in a smaller bucket") {
    val rows = graft.queries.Mining.q154.build(spark, sf).collect()
    assert(rows.nonEmpty)
    for ((qCol, mCol) <- Seq("r_q" -> "r_days", "f_q" -> "f_n", "m_q" -> "m_cents")) {
      val sizes = rows.groupBy(_.getAs[Int](qCol)).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$qCol sizes $sizes")
      val byBucket = rows.groupBy(_.getAs[Int](qCol))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long](mCol)) }
      for (q <- byBucket.keys if byBucket.contains(q + 1))
        assert(byBucket(q).max <= byBucket(q + 1).min,
          s"$qCol bucket $q overlaps ${q + 1}")
    }
  }

  test("q157 shares are a distribution: per feature and half, ppm sums land " +
    "within truncation slack of 1e6") {
    val rows = graft.queries.Mining.q157.build(spark, sf).collect()
    assert(rows.nonEmpty)
    for (feature <- rows.map(_.getString(0)).distinct;
         col <- Seq("p_first_ppm", "p_second_ppm")) {
      val fr = rows.filter(_.getString(0) == feature)
      val sum = fr.map(_.getAs[Long](col)).sum
      assert(sum <= 1000000L && sum >= 1000000L - fr.length,
        s"$feature $col ppm sum $sum")
    }
  }

  test("q155 encodings shrink toward the prior: every encoding lies between " +
    "the raw group mean and the global prior") {
    val g = graft.core.Tables(spark, sf, "customer")
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("s"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    val prior = g.values.map(_._2).sum / g.values.map(_._1).sum
    val rows = graft.queries.Mining.q155.build(spark, sf).collect()
    for (r <- rows) {
      val key = (r.getAs[Number](0).longValue(), r.getString(1))
      val (n, s) = g(key)
      val mean = s.toDouble / n
      val enc = r.getAs[Long]("enc_cents").toDouble
      val (lo, hi) = (math.min(mean, prior.toDouble), math.max(mean, prior.toDouble))
      assert(enc >= lo - 1 && enc <= hi + 1, s"$key enc $enc outside [$lo, $hi]")
    }
  }

  test("q158's z-score agrees with a local recomputation from its own " +
    "integer counts, and its sign tracks the rate difference") {
    val r = graft.queries.Mining.q158.build(spark, sf).collect().head
    val (n1, c1, n2, c2) = (r.getAs[Long]("n1"), r.getAs[Long]("c1"),
      r.getAs[Long]("n2"), r.getAs[Long]("c2"))
    val (p1, p2) = (c1.toDouble / n1, c2.toDouble / n2)
    val pp = (c1 + c2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    val zMicro = r.getAs[Long]("z_micro")
    assert(math.abs(zMicro - math.round(z * 1e6)) <= 1, s"$zMicro vs $z")
    assert((zMicro > 0) === (p1 > p2) || zMicro === 0L)
  }

  test("q159's golden records equal a local union-find + survivorship " +
    "recomputation over the same pair graph") {
    // local rebuild: 5-gram sets per doc, pairs sharing >= 10 grams
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", $"text", $"source", $"lang", $"n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "),
        r.getString(2), r.getString(3), r.getLong(4)))
    val gramSets = docs.filter(_._2.length >= 5).map { case (id, t, _, _, _) =>
      id -> t.sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    val ids = gramSets.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (ids(i), ids(j))
      if ((gramSets(a) intersect gramSets(b)).size >= 10)
        parent(find(a)) = find(b)
    }
    val attrs = docs.map(d => d._1 -> (d._3, d._4, d._5)).toMap
    val expected = ids.groupBy(find).values.filter(_.length >= 2).map { m =>
      def mode(f: Long => String) = m.groupBy(f).toSeq
        .map { case (v, xs) => (-xs.length, v) }.min._2
      (m.min, m.length.toLong, mode(attrs(_)._1), mode(attrs(_)._2),
        m.map(attrs(_)._3).max)
    }.toSet
    val got = graft.queries.Mining.q159.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q160's KS statistic equals a local brute-force computation over " +
    "the same arm split") {
    val purch = graft.core.Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (conv(substring(md5(concat($"user_id".cast("string"), lit(":ab"))),
          1, 4), 16, 10).cast("int") % 2).as("arm"))
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    val a0 = purch.filter(_._1 == 0).map(_._2).sorted
    val a1 = purch.filter(_._1 == 1).map(_._2).sorted
    val (n1, n2) = (a0.length.toLong, a1.length.toLong)
    val values = (a0 ++ a1).distinct.sorted
    val best = values.map { v =>
      val c1 = a0.count(_ <= v).toLong; val c2 = a1.count(_ <= v).toLong
      (math.abs(c1 * n2 - c2 * n1), v)
    }.maxBy(g => (g._1, -g._2))
    val r = graft.queries.Mining.q160.build(spark, sf).collect().head
    assert(r.getAs[Long]("n1") === n1)
    assert(r.getAs[Long]("n2") === n2)
    assert(r.getAs[Long]("at_cents") === best._2)
    assert(r.getAs[Long]("ks_ppm") === best._1 * 1000000L / (n1 * n2))
  }

  test("q162: consistent hashing moves FAR less data on reshard than " +
    "modulo assignment — the property that justifies the ring") {
    val matrix = graft.queries.Mining.q162.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = matrix.map(_._3).sum
    val moved = matrix.filter(x => x._1 != x._2).map(_._3).sum
    // ring expectation: ~ new_shards/total_shards = 4/12 of docs move
    assert(moved.toDouble / total < 0.55, s"ring moved $moved/$total")
    // modulo reshard 8 -> 12 on the same ids moves ~everything
    val ids = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    val modMoved = ids.count(i => i % 8 != i % 12)
    assert(moved.toDouble / total < 0.8 * modMoved.toDouble / ids.length,
      s"ring $moved/$total vs modulo $modMoved/${ids.length}")
  }

  test("q163 repetition signals equal a local per-doc brute force") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", $"text", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val per = docs.map { case (_, text, src) =>
      val toks = text.split(" ")
      val top2 = if (toks.length < 2) 0L else {
        val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).toSeq.map { case (g, xs) => (xs.length.toLong, g) }
        // argmax (cnt, len, gram) — the max(struct) tie-break order
        val (cnt, gram) = counts.maxBy { case (c, g) => (c, g.length, g) }
        Math.floorDiv(cnt * gram.length * 1000000L, text.length.toLong)
      }
      val dup5 = if (toks.length < 5) 0L else {
        val g5 = toks.sliding(5).map(_.mkString(" ")).toSeq
        Math.floorDiv((g5.length - g5.distinct.length) * 1000000L, g5.length.toLong)
      }
      (src, top2, dup5)
    }
    val expected = per.groupBy(_._1).map { case (src, xs) =>
      (src, xs.length.toLong,
        xs.count(x => x._2 > 200000L || x._3 > 150000L).toLong,
        xs.map(_._2).sum / xs.length, xs.map(_._3).sum / xs.length)
    }.toSet
    val got = Mining.q163.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q164 mixture shares: sampling ppm sums to ~1e6 and sqrt-temperature " +
    "compresses the mix toward uniform") {
    val rows = Mining.q164.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val sampSum = rows.map(_._4).sum
    assert(sampSum > 1000000L - rows.length && sampSum <= 1000000L)
    // temperature flattens RATIOS (samp_i/samp_j = sqrt(nat_i/nat_j)), so
    // the spread compresses; per-source "samp between nat and uniform" is
    // NOT a theorem (near-uniform sources overshoot by rounding-scale
    // amounts), but order preservation and spread compression are.
    val byTok = rows.sortBy(_._2)
    byTok.sliding(2).foreach {
      case Array((s1, _, _, p1), (s2, _, _, p2)) =>
        assert(p2 >= p1 - 1, s"order broken: $s1=$p1 vs $s2=$p2")
      case _ =>
    }
    val natSpread = rows.map(_._3).max.toDouble / rows.map(_._3).min
    val sampSpread = rows.map(_._4).max.toDouble / rows.map(_._4).min
    assert(sampSpread <= natSpread + 1e-9,
      s"spread not compressed: samp $sampSpread vs nat $natSpread")
  }

  test("q165 stratified split cuts every stratum at exactly floor(8n/10) / " +
    "floor(9n/10) and covers all docs") {
    val rows = Mining.q165.build(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.foreach { case (n, tr, va, te) =>
      assert(tr === n * 8 / 10)
      assert(va === n * 9 / 10 - n * 8 / 10)
      assert(te === n - n * 9 / 10)
    }
    val totalDocs = graft.core.Tables(spark, sf, "documents").count()
    assert(rows.map(_._1).sum === totalDocs)
  }

  test("q166 Chao1/coverage equal a local token-count brute force") {
    val toks = graft.core.Tables(spark, sf, "documents")
      .select($"text").as[String].collect().flatMap(_.split(" "))
    val counts = toks.groupBy(identity).map(_._2.length.toLong).toSeq
    val (d, n) = (counts.length.toLong, counts.sum)
    val f1 = counts.count(_ == 1L).toLong
    val f2 = counts.count(_ == 2L).toLong
    val r = Mining.q166.build(spark, sf).collect().head
    assert(r.getAs[Long]("n_tok") === n)
    assert(r.getAs[Long]("d_obs") === d)
    assert(r.getAs[Long]("f1") === f1)
    assert(r.getAs[Long]("f2") === f2)
    assert(r.getAs[Long]("chao1") === d + (f1 * (f1 - 1)) / (2 * (f2 + 1)))
    assert(r.getAs[Long]("coverage_ppm") === (n - f1) * 1000000L / n)
  }

  test("q167 growth curve: cumulatives cover the whole corpus and vocabulary") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mx = docs.map(_._1).max
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, text) =>
      text.split(" ").foreach(t => if (!firstDoc.contains(t)) firstDoc(t) = id)
    }
    val expNew = firstDoc.values.groupBy(id => id * 10 / (mx + 1))
      .map { case (dec, xs) => dec -> xs.size.toLong }
    val rows = Mining.q167.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (dec, _, nt, _, _) =>
      assert(nt === expNew.getOrElse(dec.toLong, 0L), s"decile $dec")
    }
    assert(rows.map(_._2).sum === docs.length.toLong)
    assert(rows.last._4 === docs.length.toLong)
    assert(rows.last._5 === firstDoc.size.toLong)
    assert(rows.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("q168 histogram partitions the corpus: sum(n_docs) = corpus, " +
    "removable = docs minus clusters") {
    val texts = graft.core.Tables(spark, sf, "documents")
      .select($"text").as[String].collect()
    val sizes = texts.groupBy(identity).map(_._2.length.toLong).toSeq
    val expected = sizes.groupBy(identity).map { case (sz, xs) =>
      (sz, xs.length.toLong, sz * xs.length, (sz - 1) * xs.length)
    }.toSet
    val got = Mining.q168.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.map(_._3).sum === texts.length.toLong)
  }

  test("q169 containment equals an all-pairs local brute force at the " +
    "declared floor") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    def g5(t: Array[String]): Set[String] =
      if (t.length < 5) Set.empty else t.sliding(5).map(_.mkString(" ")).toSet
    val ev = docs.filter(_._2 == "src1").map(d => (d._1, g5(d._3)))
      .filter(_._2.nonEmpty)
    val tr = docs.filter(_._2 != "src1").map(d => (d._1, g5(d._3)))
      .filter(_._2.nonEmpty)
    val expected = (for {
      (tid, tg) <- tr; (eid, eg) <- ev
      shared = (tg intersect eg).size.toLong
      if shared * 10 >= eg.size.toLong * 3
    } yield (tid, eid, shared, eg.size.toLong,
      shared * 1000000L / eg.size)).toSet
    val got = Mining.q169.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q147 respects the support floor and the declared integer lift") {
    val rows = Mining.q147.build(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5))
    // lift is monotone-decreasing down the returned ranking
    val lifts = rows.map(_.getAs[Long]("lift")).toSeq
    assert(lifts === lifts.sorted.reverse)
  }

  test("q211 DBSCAN assignments equal a brute-force single-node reference") {
    // sf0.001: 150 points — small enough to re-derive the full DBSCAN
    // answer sequentially and demand bit-equality with the operator
    val got = Mining.q211.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // rebuild the exact integer points the query derives
    def hex6(seed: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(seed.getBytes)
          .take(3).map("%02x".format(_)).mkString, 16)
    val ids = got.map(_._1).sorted
    val pts = ids.map { id =>
      def c(ax: String) = hex6(s"b${id % 40}$ax") % 10000 +
        hex6(s"p$id$ax") % 401 - 200 + 1000
      id -> (c("x"), c("y"))
    }.toMap
    def near(a: Long, b: Long): Boolean = {
      val (ax, ay) = pts(a); val (bx, by) = pts(b)
      a != b && (ax - bx) * (ax - bx) + (ay - by) * (ay - by) < 22500
    }
    val nbrs = ids.map(a => a -> ids.filter(b => near(a, b))).toMap
    val core = ids.filter(a => nbrs(a).size >= 4).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> find(c)).toMap
    val expected = ids.map { id =>
      if (core(id)) (id, 2, label(id))
      else {
        val cn = nbrs(id).filter(core)
        if (cn.nonEmpty) (id, 1, cn.map(label).min) else (id, 0, -1L)
      }
    }
    assert(got.sortBy(_._1) === expected)
  }
}
