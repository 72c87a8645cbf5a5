package graft.queries

import graft.SparkSpecBase

/** q91 inverted-index pins (the r7-verdict "weak" fix): postings shard
  * into fixed doc-id-range blocks, so a stop word that appears in EVERY
  * document still never builds a row wider than the bucket width — the
  * same hot-key bound MinHashLSH/SemDeDup/SpatialJoin enforce.
  */
class TextOpsSpec extends SparkSpecBase {

  test("planted stop word in every doc of a 350-doc corpus yields only " +
    "bounded postings blocks") {
    import spark.implicits._
    val docs = (0L until 350L).map(i => (i, s"the quick doc$i the end"))
      .toDF("doc_id", "text")
    val idx = Text.invertedIndex(docs, bucketWidth = 100).cache()
    try {
      val the = idx.filter($"term" === "the").collect()
      // 350 docs / width 100 -> 4 blocks (last partial), never one row
      assert(the.length === 4)
      val dfs = the.map(_.getAs[Long]("df"))
      assert(dfs.forall(_ <= 100), dfs.mkString(","))
      assert(dfs.sum === 350)
      // cf counts both occurrences per doc
      assert(the.map(_.getAs[Long]("cf")).sum === 700)
      // every block's postings string holds exactly df entries
      the.foreach { r =>
        assert(r.getAs[String]("postings").split(",").length
          === r.getAs[Long]("df"))
      }
      // no block anywhere in the index exceeds the bucket width
      val maxDf = idx.agg(org.apache.spark.sql.functions.max($"df"))
        .collect()(0).getLong(0)
      assert(maxDf <= 100)
    } finally idx.unpersist()
  }

  test("block-local payloads reassemble to the term-level index") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (150L, "a"), (260L, "a a")).toDF("doc_id", "text")
    val a = Text.invertedIndex(docs, bucketWidth = 100)
      .filter($"term" === "a").collect()
    assert(a.map(_.getAs[Long]("bucket")).toSeq === Seq(0L, 1L, 2L))
    assert(a.map(_.getAs[Long]("cf")).sum === 4)  // doc 260 has tf=2
    assert(a.map(_.getAs[String]("postings")).toSeq
      === Seq("0:1", "150:1", "260:1"))
  }

  test("chunk windows: remainders kept, short docs one chunk, overlap " +
    "spans the stride boundary, empty docs none") {
    import spark.implicits._
    val toks = (1 to 80).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toks),          // 80 tokens -> starts 0,24,48 (48+32 covers 80;
                           // a 4th chunk at 72 would be a strict subset)
      (2L, "a b c"),       // short doc -> one chunk of 3
      (3L, ""),            // no tokens -> no chunks
      (4L, (1 to 24).map(i => s"u$i").mkString(" ")), // exactly one stride
      (5L, (1 to 32).map(i => s"v$i").mkString(" ")), // exactly one window ->
                           // ONE chunk (ADVICE r8: old code emitted a 2nd
                           // chunk 25..32 fully contained in the 1st)
      (6L, (1 to 33).map(i => s"w$i").mkString(" ")) // one past the window ->
                           // 2nd chunk extends coverage, so it stays
    ).toDF("doc_id", "text")
    val c = Text.chunkWindows(docs, window = 32, stride = 24)
      .orderBy($"doc_id", $"chunk_id").collect()
    val byDoc = c.groupBy(_.getLong(0))
    assert(byDoc(1L).map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
      === Seq((0, 0, 32), (1, 24, 32), (2, 48, 32)))
    assert(byDoc(2L).map(r => (r.getInt(2), r.getInt(3))).toSeq === Seq((0, 3)))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).map(r => (r.getInt(2), r.getInt(3))).toSeq === Seq((0, 24)))
    assert(byDoc(5L).map(r => (r.getInt(2), r.getInt(3))).toSeq === Seq((0, 32)))
    assert(byDoc(6L).map(r => (r.getInt(2), r.getInt(3))).toSeq
      === Seq((0, 32), (24, 9)))
    // the 8-token overlap: chunk 1 of doc 1 starts at t25 and must
    // contain t25..t32 (shared with chunk 0's tail)
    val fp0 = byDoc(1L)(0).getString(4)
    val fp1 = byDoc(1L)(1).getString(4)
    assert(fp0 !== fp1)
  }

  test("q259 serve path: decoding the stored LEB128 blocks reproduces " +
    "the pre-encode postings exactly; a corrupt block throws at the " +
    "probe instead of changing the ranking silently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.PostingCodec
    // 250 docs, 'hot' planted in all (multi-block term), 'rare' in two
    val docs = (0L until 250L).map(i =>
      (i, s"hot filler$i ${if (i == 3 || i == 177) "rare hot" else "x"}"))
      .toDF("doc_id", "text")
    val rollup = docs
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"), min($"pos").as("first_pos"))
    val store = rollup
      .groupBy($"term", floor($"doc_id" / 100).as("bucket"))
      .agg(sort_array(collect_list(
        struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
      .as[(String, Long, Seq[(Long, Long, Long)])]
      .map { case (t, b, ps) => (t, b, ps.size, PostingCodec.encode(ps)) }
      .toDF("term", "bucket", "df", "bytes")
    def serve(st: org.apache.spark.sql.DataFrame) = st
      .filter($"term".isin("hot", "rare"))
      .as[(String, Long, Int, Array[Byte])]
      .flatMap { case (t, _, df, bytes) =>
        PostingCodec.decode(bytes, df).getOrElse(
          throw new IllegalStateException(s"corrupt block for '$t'"))
          .map { case (d, tf, fp) => (t, d, tf, fp) }
      }.toDF("term", "doc_id", "tf", "first_pos")
    val decoded = serve(store).orderBy($"term", $"doc_id").collect()
    val direct = rollup.filter($"term".isin("hot", "rare"))
      .orderBy($"term", $"doc_id").collect()
    assert(decoded.length === direct.length) // 250 hot + 2 rare
    assert(decoded.length === 252)
    decoded.zip(direct).foreach { case (a, b) =>
      assert((a.getString(0), a.getLong(1), a.getLong(2), a.getLong(3))
        === (b.getString(0), b.getAs[Number](1).longValue,
          b.getAs[Number](2).longValue, b.getAs[Number](3).longValue))
    }
    // flip one byte in a probed block: the serve must THROW, not rank
    val corrupt = store.as[(String, Long, Int, Array[Byte])]
      .map { case (t, b, df, bytes) =>
        if (t == "rare") { bytes(bytes.length - 1) =
          (bytes(bytes.length - 1) ^ 0x80).toByte }
        (t, b, df, bytes)
      }.toDF("term", "bucket", "df", "bytes")
    val e = intercept[Exception] { serve(corrupt).collect() }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8).map(_.toString).mkString(" | ")
    assert(chain.contains("corrupt block"), chain)
  }

  test("blocklist gate: leet-folded obfuscations hit, word boundaries " +
    "protect substrings (no scunthorpe over-block)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "SLOW 5l0w s10w fine"),   // case + two leet spellings of 'slow'
      (2L, "slowly meadups fine"),   // substrings only -> zero flags
      (3L, "ok text here")
    ).toDF("doc_id", "text")
    val bl = graft.functions.Fixtures.blocklistDf(spark)
    val out = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .select($"doc_id", translate(lower($"term"),
        graft.functions.Fixtures.leetFrom,
        graft.functions.Fixtures.leetTo).as("nt"))
      .join(broadcast(bl), $"nt" === $"bterm", "left_outer")
      .groupBy($"doc_id").agg(count($"bterm").as("n_flagged"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 3L, s"obfuscated hits missed: $out")
    assert(out(2L) === 0L, s"substring over-block: $out")
    assert(out(3L) === 0L)
  }

  test("q306 containment: sharded positional phrase == single-index " +
    "q263 row for row, every matched doc served by ITS OWN shard") {
    import spark.implicits._
    val single = Text.q263.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val sharded = Text.q306.build(spark, sf).collect()
    assert(sharded.nonEmpty, "no phrase hits — fixture is vacuous")
    assert(sharded.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === single,
      "sharded phrase diverged from the single-index serve")
    // positions are doc-local: the serving shard is ALWAYS the doc's
    // own — matching never crossed a shard boundary
    sharded.foreach { r =>
      assert(r.getLong(3) === r.getLong(0) % 4,
        s"doc ${r.getLong(0)} matched outside its shard")
    }
  }

  test("q308 k-term generalization: the 3-term chain equals the 2-term " +
    "join of the first pair intersected with the shifted third term") {
    import spark.implicits._
    // brute-force from raw text at sf0.001
    val docs = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.flatMap { case (id, t) =>
      val ws = t.split(" ")
      val starts = ws.indices.dropRight(2).filter(i =>
        ws(i) == "key" && ws(i + 1) == "scan" && ws(i + 2) == "sort")
      if (starts.isEmpty) None
      else Some((id, starts.size.toLong, starts.min.toLong + 1))
    }.sortBy(_._1).toSeq
    val got = Text.q308.build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(want.nonEmpty, "phrase absent at sf0.001 — fixture is vacuous")
    assert(got === want, "k-term phrase diverged from brute force")
  }

  test("q314 zone-map skip: on a skewed corpus the intersection prunes " +
    "blocks UNDECODED and the hits still equal brute force") {
    import spark.implicits._
    // 600 docs / 6 buckets; 'rare' lives ONLY in bucket 1 — every other
    // bucket's 'common'/'filler' blocks must skip
    val docs = (0L until 600L).map { i =>
      val t =
        if (i >= 100 && i < 200 && i % 3 == 0) "common rare filler x"
        else if (i % 2 == 0) "common filler x x"
        else "filler common x x"
      (i, t)
    }
    val out = Text.conjunctiveSearch(docs.toDF("doc_id", "text"),
      Seq("common", "rare", "filler")).collect()
    val want = docs.filter { case (_, t) =>
      val ws = t.split(" ").toSet
      ws("common") && ws("rare") && ws("filler")
    }.map(_._1).toSeq.sorted
    assert(out.map(_.getLong(0)).toSeq === want,
      "conjunctive hits diverged from brute force")
    val (meta, dec) = (out.head.getLong(2), out.head.getLong(3))
    // 'common'/'filler' block in all 6 buckets, 'rare' only in bucket 1
    // -> 13 metadata blocks, 3 decoded
    assert(dec < meta, s"nothing skipped: meta=$meta decoded=$dec")
    assert(dec === 3L && meta === 13L,
      s"unexpected zone-map counts: meta=$meta decoded=$dec")
  }
}
