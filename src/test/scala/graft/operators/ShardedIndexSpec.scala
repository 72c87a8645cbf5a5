package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X115 sharded scatter-gather pins: (1) exactness — merged per-shard
  * top-k equals the exhaustive single-index ranking row for row on a
  * mixed corpus; (2) the containment law the exactness rests on —
  * every global top-k doc survives its own shard's local top-k;
  * (3) the wire bound — each shard's gather contribution is ≤ k rows;
  * (4) the dfs_query_then_fetch lesson — per-shard df produces a
  * DIFFERENT ranking on a df-skewed corpus (a rare-in-its-shard doc
  * jumps the queue), so the global-df metadata sum is load-bearing,
  * not a stylistic choice; (5) TopKLong ≡ sort-take, ties broken by
  * id ASC, exact at scores a Double cannot carry.
  */
class ShardedIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val qTerms = Seq("alpha", "beta")

  // 200 docs, tf/dl varied so scores are distinct-ish and every shard
  // holds hits: tf_alpha = 1 + i mod 5, filler stretches dl by i mod 13.
  private val corpus = (0L until 200L).map { i =>
    val alphas = Seq.fill(1 + (i % 5).toInt)("alpha")
    val betas = if (i % 3 == 0) Seq("beta") else Seq.empty
    val fill = Seq.fill(3 + (i % 13).toInt)(s"w${i % 7}")
    (i, (alphas ++ betas ++ fill).mkString(" "))
  }

  private def exhaustive(docs: org.apache.spark.sql.DataFrame, k: Int,
      terms: Seq[String]) = {
    val toks = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("dl"),
      explode(split($"text", " ")).as("term"))
    val hits = toks.filter($"term".isin(terms: _*))
    val tf = hits.groupBy($"doc_id", $"term", $"dl").agg(count(lit(1)).as("tf"))
    val dfreq = hits.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size(split($"text", " "))).cast("long").as("l_total"))
      .select($"n_docs", expr("l_total DIV n_docs").as("adl"))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("contrib_ppm", expr(
        """(22 * tf * adl * (2 * n_docs - 2 * df + 1) * 1000000)
           DIV ((10 * tf * adl + 3 * adl + 9 * dl) * (2 * df + 1))"""))
      .groupBy($"doc_id").agg(sum($"contrib_ppm").as("score_ppm"))
      .orderBy($"score_ppm".desc, $"doc_id").limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("scatter-gather merge equals the exhaustive single-index ranking") {
    val docs = corpus.toDF("doc_id", "text")
    val served = ShardedIndex.serve(docs, qTerms, k = 15)
    val got = served.merged.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exhaustive(docs, 15, qTerms))
    // shard provenance is the real shard key
    served.merged.collect().foreach(r =>
      assert(r.getLong(2) == r.getLong(0) % 4))
  }

  test("containment: every global top-k doc survives its shard's local top-k") {
    val docs = corpus.toDF("doc_id", "text")
    val served = ShardedIndex.serve(docs, qTerms, k = 15)
    val local = served.perShard.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // (shard, doc)
    exhaustive(docs, 15, qTerms).foreach { case (doc, _) =>
      assert(local.contains((doc % 4, doc)),
        s"global top-k doc $doc missing from shard ${doc % 4}'s local list")
    }
  }

  test("gather wire bound: each shard contributes at most k rows") {
    val docs = corpus.toDF("doc_id", "text")
    val served = ShardedIndex.serve(docs, qTerms, k = 15)
    val perShardCounts = served.perShard.groupBy($"shard").count()
      .collect().map(_.getLong(1))
    assert(perShardCounts.nonEmpty && perShardCounts.forall(_ <= 15))
  }

  test("per-shard df skews the ranking — the global-df sum is load-bearing") {
    // shard 0: 'alpha' is COMMON (30 docs, tf=3, short) — low local idf;
    // shard 1: 'alpha' is RARE (1 doc, tf=1, long dl) — huge local idf.
    // Globally doc 1 scores far below the shard-0 docs; with per-shard
    // df its inflated idf jumps it over them.
    val docs = (0L until 120L).map { i =>
      val txt =
        if (i % 4 == 0) "alpha alpha alpha w w"
        else if (i == 1L) ("alpha " + Seq.fill(40)("z").mkString(" "))
        else Seq.fill(5)(s"f${i % 3}").mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")
    val good = ShardedIndex.serve(docs, Seq("alpha"), k = 10)
      .merged.collect().map(_.getLong(0)).toSeq
    val bad = ShardedIndex.serve(docs, Seq("alpha"), k = 10, globalDf = false)
      .merged.collect().map(_.getLong(0)).toSeq
    assert(good == exhaustive(docs, 10, Seq("alpha")).map(_._1))
    assert(bad != good, "per-shard df should visibly skew the merge")
    assert(bad.head == 1L && !good.headOption.contains(1L),
      "the rare-in-its-shard doc should jump the queue under local df")
  }

  test("TopKLong ≡ sort-take with id-ASC ties, exact past the Double boundary") {
    // two scores that collide when cast to Double (2^53 and 2^53 + 1)
    val big = 1L << 53
    val rows = Seq((big + 1, 10L, 0L), (big, 11L, 0L), (5L, 2L, 0L),
      (5L, 1L, 0L), (3L, 3L, 0L)).toDF("s", "id", "t")
    val agg = udaf(new graft.functions.TopKLong(3))
    val got = rows.agg(agg($"s", $"id", $"t").as("tk"))
      .select(explode($"tk").as("e")).select($"e.score", $"e.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((big + 1, 10L), (big, 11L), (5L, 1L)))
  }
}
