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
}
