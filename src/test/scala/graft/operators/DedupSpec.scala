package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Recall properties of the approximate dedup operators on planted
  * near-dups (exact-output checks are the DuckDB oracle's job —
  * q54-q57; here we assert the LSH machinery finds what it must). */
class DedupSpec extends SparkSpecBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    val d = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    d.unionByName(d.filter($"doc_id" % 5 === 0).select(
      ($"doc_id" + 100000).as("doc_id"),
      concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text")))
  }

  test("minhash-LSH recovers >= 90% of planted near-dup pairs") {
    val s = spark
    import s.implicits._
    val planted = docs.filter($"doc_id" >= 100000).select(($"doc_id" - 100000).as("a_id")).collect().map(_.getLong(0)).toSet
    val found = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 0.5)
      .filter($"b_id" === $"a_id" + 100000)
      .select($"a_id").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    assert(found.intersect(planted).size >= planted.size * 0.9,
      s"recall ${found.intersect(planted).size}/${planted.size}")
  }

  test("crossNearDup finds each probe's corpus source and never pairs " +
    "probes with unrelated docs") {
    val s = spark
    import s.implicits._
    val base = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val tokens = split($"text", " ")
    val probes = base.filter($"doc_id" % 10 === 0).select(
      ($"doc_id" + 500000).as("probe_id"),
      concat_ws(" ", slice(tokens, lit(1), size(tokens) - 2)).as("text"))
    val hits = MinHashLSH.crossNearDup(base, "doc_id", probes, "probe_id",
        "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sources = probes.select(($"probe_id" - 500000).as("src"))
      .as[Long].collect().toSet
    // >= 90% of probes match their source doc (LSH recall contract)
    val matched = hits.filter { case (c, p) => c == p - 500000 }.map(_._1).toSet
    assert(sources.nonEmpty &&
      matched.size >= sources.size * 0.9,
      s"recall ${matched.size}/${sources.size}")
    // every reported pair clears the jaccard bar against ITS probe, so
    // any non-source pair must be a genuine corpus-internal near-dup —
    // at minimum, no probe pairs with itself shifted
    assert(hits.forall { case (c, p) => c < 500000 && p >= 500000 })
  }

  test("identical texts have simhash hamming distance 0") {
    val s = spark
    import s.implicits._
    val two = Seq((1L, "spark merge fast table"), (2L, "spark merge fast table")).toDF("doc_id", "text")
    val tf = two.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val out = SimHash.nearDupPairs(
      SimHash.fingerprints(tf, "doc_id", "term", "tf"), "doc_id", maxHamming = 0)
      .collect()
    assert(out.length === 1 && out.head.getAs[Any]("hamming") == 0)
  }

  test("minhash viral-bucket cap: a 1000+-copy boilerplate text generates " +
    "ZERO candidate pairs while honest near-dups still pair up") {
    val s = spark
    import s.implicits._
    val boiler = "click here to accept cookies and continue to the site content"
    val viral = (1L to 1200L).map(i => (i, boiler)).toDF("doc_id", "text")
    val honest = Seq(
      (5001L, "a perfectly ordinary document about spark shuffle behavior today"),
      (5002L, "a perfectly ordinary document about spark shuffle behavior")
    ).toDF("doc_id", "text")
    val corpus = viral.unionByName(honest)
    val pairs = MinHashLSH.nearDupPairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the cap the viral bucket alone is 1200*1199/2 ≈ 719k pairs
    assert(pairs.toSet === Set((5001L, 5002L)))
    // the dropped buckets are observable
    val dropped = MinHashLSH.bucketStats(corpus, "doc_id", "text")
      .filter($"dropped").count()
    assert(dropped >= 1)
  }

  test("simhash 4x16-bit banding: candidate generation is EXACT for " +
    "hamming <= 3 (pigeonhole over 4 bands) and bucket sizes stay tiny") {
    val s = spark
    import s.implicits._
    val instances = docs.select($"doc_id",
      explode(split($"text", " ")).as("term"), lit(1L).as("tf"))
    val fp = SimHash.fingerprints(instances, "doc_id", "term", "tf").persist()
    // Brute-force ground truth over ALL pairs (fingerprints only — cheap
    // at test scale): banding must reproduce it exactly, because a pair
    // differing in <= 3 of 64 bits leaves at least one of the 4 bands
    // untouched. The verify-step filter never has to rescue recall.
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        (0 until SimHash.Bands).map(k =>
          bit_count(col(s"a.f$k").bitwiseXOR(col(s"b.f$k")))).reduce(_ + _).as("h"))
      .filter($"h" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SimHash.nearDupPairs(fp, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && banded === brute)
    // 65,536 buckets per band: the corpus (~600 docs incl. planted dups)
    // must spread out — a fat bucket would mean the O(N²/buckets)
    // within-bucket join is back. Planted dups share buckets by design,
    // so the bound is "tiny", not 1.
    val maxBucket = (0 until SimHash.Bands).map { k =>
      fp.groupBy(col(s"f$k")).count().agg(max($"count")).head().getLong(0)
    }.max
    val n = fp.count()
    assert(maxBucket <= n / 10, s"fattest band bucket: $maxBucket of $n docs")
    fp.unpersist()
  }

  test("q187 SemDeDup: the decision table equals a brute-force recompute " +
    "of the rule (drop iff a lower-id same-cluster neighbor at cos >= tau)") {
    val s = spark
    import s.implicits._
    val out = graft.queries.Dedup.q187.build(s, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    // brute force on the driver: same clustering (KMeansInt is already
    // partition-invariant by spec), all pairs, double cosine
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cluster = out.map { case (id, c, _) => id -> c }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i)*b(i); aa += a(i)*a(i); bb += b(i)*b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val ids = out.map(_._1)
    val expectDropped = ids.filter(b =>
      ids.exists(a => a < b && cluster(a) == cluster(b) &&
        cos(emb(a), emb(b)) >= 0.35)).toSet
    assert(expectDropped.nonEmpty, "tau too high: rule never fired on the fixture")
    for ((id, _, kept) <- out)
      assert(kept === !expectDropped(id), s"vec $id kept=$kept diverges from rule")
    // and the smallest id of every cluster always survives
    for ((c, members) <- out.groupBy(_._2)) {
      val min = members.minBy(_._1)
      assert(min._3, s"cluster $c minimum id ${min._1} must be kept")
    }
  }

  test("sign-LSH: a rescaled vector keeps its bucket (scale invariance)") {
    val s = spark
    import s.implicits._
    val e = s.read.parquet(s"$sf/embeddings.parquet").select($"vec_id", $"embedding")
    val moved = e.select(
      SignLSH.bucket($"embedding").as("orig"),
      SignLSH.bucket(transform($"embedding", x => (x.cast("double") * 0.999).cast("float"))).as("scaled"))
      .filter($"orig" =!= $"scaled").count()
    // float re-rounding can flip a razor-thin sign; must be rare
    assert(moved <= e.count() / 50, s"$moved bucket moves")
  }

  test("sign-LSH near-dup pairs recover >= 90% of planted rescaled copies") {
    val s = spark
    import s.implicits._
    val e = s.read.parquet(s"$sf/embeddings.parquet").select($"vec_id", $"embedding")
    val planted = e.filter($"vec_id" % 5 === 0).select(
      ($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => (x.cast("double") * 0.999).cast("float")).as("embedding"))
    val n = planted.count()
    val found = SignLSH.nearDupPairs(e.unionByName(planted), "vec_id", "embedding", 0.999)
      .filter($"b_id" === $"a_id" + 100000).count()
    assert(n > 0 && found >= n * 0.9, s"recall $found/$n")
  }

  test("semdedup viral-cluster cap: a degenerate one-cluster corpus keeps " +
    "EVERY vector (zero pair work) while honest semantic dups in small " +
    "clusters still drop") {
    val s = spark
    import s.implicits._
    // 300 identical vectors — k-means puts them all in one cluster, and
    // without the cap that is 300·299/2 ≈ 45k pairs from a single key
    // (at corpus scale: 10^6 copies of boilerplate → 10^12 pairs).
    val boiler = (1L to 300L).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(1), lit(8)), i => (i * lit(0.1f)).cast("float")))
    val capped = SemDeDup
      .dedup(boiler, "vec_id", "embedding", k = 4, rounds = 1,
        tau = 0.9, maxClusterSize = 100L)
      .collect()
    // the viral cluster is excluded from the pair stage → all kept
    assert(capped.length === 300 && capped.forall(_.getAs[Boolean]("kept")))
    // …and the exclusion is loud, not silent
    val stats = SemDeDup.clusterStats(boiler, "vec_id", "embedding",
      k = 4, rounds = 1, maxClusterSize = 100L)
    assert(stats.filter($"capped").count() >= 1)
    // Honest case: two orthogonal families of 4, each with one planted
    // near-dup (cos = 1 within the pair, 0 across families). Clusters
    // stay under the cap, so the planted dup (higher id) drops and the
    // min-id survivor is kept.
    val a = Seq.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val b = Seq.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
    val honest = Seq(
      (1L, a), (2L, b), (11L, a), (12L, b)
    ).toDF("vec_id", "embedding")
    val out = SemDeDup
      .dedup(honest, "vec_id", "embedding", k = 2, rounds = 2,
        tau = 0.9, maxClusterSize = 100L)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("kept")).toMap
    assert(out(1L) && out(2L) && !out(11L) && !out(12L))
  }

  test("semdedup chooseK: k grows linearly with N (the paper's bound), " +
    "clamped to [minK, maxK]") {
    assert(SemDeDup.chooseK(0L) === 8)
    assert(SemDeDup.chooseK(100L) === 8)                   // minK floor
    assert(SemDeDup.chooseK(1024L * 100) === 100)          // exact ratio
    assert(SemDeDup.chooseK(1024L * 100 + 1) === 101)      // ceil, not floor
    assert(SemDeDup.chooseK(5_000_000_000L) === (1 << 16)) // maxK broadcast cap
    // scale invariance: 10× the corpus at the same target = 10× the k,
    // so per-cluster pair work stays constant — linear total work
    val k1 = SemDeDup.chooseK(1_000_000L, 1000L)
    val k10 = SemDeDup.chooseK(10_000_000L, 1000L)
    assert(k1 === 1000 && k10 === k1 * 10)
  }

  test("per-row bandedSignatureArr equals the explode+groupBy signature " +
    "rollup's band keys exactly (the streaming projection's contract)") {
    val s = spark
    import s.implicits._
    val corpus = docs.limit(200)
    val perRow = corpus
      .select($"doc_id", MinHashLSH.bandedSignatureArr($"text").as("bk"))
      .filter(size($"bk") > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    // reconstruct the batch band keys from docSignatures' sig columns
    // with the documented base-31/rows=3 polynomial
    val agg = MinHashLSH.docSignatures(corpus, "doc_id", "text")
      .collect().map { r =>
        val sigs = (0 until 12).map(j => r.getAs[Long](s"sig$j"))
        r.getAs[Long]("doc_id") -> (0 until 4).map(b =>
          (0 until 3).map(x => sigs(b * 3 + x))
            .reduceLeft((a, y) => a * 31 + y)).toVector
      }.toMap
    assert(agg.nonEmpty && perRow === agg)
    // short docs (< k tokens) emit NO bands, matching the rollup's
    // no-rows behavior
    val short = Seq((1L, "just two")).toDF("doc_id", "text")
      .select(size(MinHashLSH.bandedSignatureArr($"text")))
      .head().getInt(0)
    assert(short === 0)
  }
}
