package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Invariants for the selection/scoring family (q178-q181) beyond the
  * DuckDB value gate: decay boundedness, allocation exactness, and fold
  * coverage.
  */
class SelectionSpec extends SparkSpecBase {

  test("q178 decayed score is positive and bounded by the undecayed sum") {
    import spark.implicits._
    val scored = Selection.q178.build(spark, sf)
      .select($"user_id", $"score_micro").as[(Long, Long)].collect().toMap
    assert(scored.nonEmpty)
    val raw = graft.core.Tables(spark, sf, "events")
      .groupBy($"user_id")
      .agg(sum(expr("CAST(rint(value * 1000000.0) AS BIGINT)")).as("m"))
      .as[(Long, Long)].collect().toMap
    scored.foreach { case (u, sc) =>
      assert(sc > 0L && sc <= raw(u),
        s"user $u: decayed $sc outside (0, ${raw(u)}]")
    }
  }

  test("q180 Neyman allocation sums to exactly k = 1000") {
    val total = Selection.q180.build(spark, sf)
      .agg(sum("alloc")).collect()(0).getLong(0)
    assert(total === 1000L)
  }

  test("q181 group folds cover all customers exactly once") {
    import spark.implicits._
    val df = Selection.q181.build(spark, sf).cache()
    try {
      val folds = df.select("fold").as[Long].collect().sorted
      assert(folds.forall(f => f >= 0 && f < 5))
      val nCust = df.agg(sum("n_customers")).collect()(0).getLong(0)
      assert(nCust === graft.core.Tables(spark, sf, "customer").count())
    } finally df.unpersist()
  }

  test("q178 precondition: fixture event values are non-negative") {
    // The Spark DIV (truncate) vs DuckDB // (floor) agreement q178's
    // header declares holds only for value >= 0 (ADVICE r5). Enforce
    // the declared domain so a fixture change surfaces loudly here
    // instead of as a silent 1-micro-per-event oracle divergence.
    val negs = graft.core.Tables(spark, sf, "events")
      .filter(col("value") < 0).count()
    assert(negs === 0L, s"$negs events with value < 0 violate the q178 DIV contract")
  }

  test("q179 PrefixScan rank is bit-identical to the single-window dense_rank form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val toks = graft.core.Tables(spark, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val windowForm = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", dense_rank().over(
        Window.orderBy($"cnt".desc, $"term")).cast(LongType))
      .select($"term", $"rnk").as[(String, Long)].collect().toMap
    // Rebuild the two-scan rank exactly as q179 does, via the public
    // query output: join back through the doc scores is lossy, so
    // assert on the full q179 result against a window-form recompute.
    val expected = toks.join(
        toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
          .withColumn("rnk", dense_rank().over(
            Window.orderBy($"cnt".desc, $"term")).cast(LongType))
          .select($"term", $"rnk"), "term")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"), sum($"rnk").as("rank_sum"),
        sum(when($"rnk" > 20, 1L).otherwise(0L)).as("n_oov"))
      .select($"doc_id", $"n_tok",
        expr("(rank_sum * 1000000) DIV n_tok").as("mean_rank_ppm"),
        expr("(n_oov * 1000000) DIV n_tok").as("oov_ppm"))
      .orderBy($"mean_rank_ppm".desc, $"doc_id")
      .limit(20).collect().toSeq
    val actual = Selection.q179.build(spark, sf).collect().toSeq
    assert(windowForm.nonEmpty)
    assert(actual === expected)
  }

  test("q179 oov fraction is a valid ppm and docs are worst-first") {
    import spark.implicits._
    val rows = Selection.q179.build(spark, sf)
      .select("mean_rank_ppm", "oov_ppm").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, o) => o >= 0 && o <= 1000000L })
    val ranks = rows.map(_._1)
    assert(ranks.sameElements(ranks.sortBy(-_)))
  }

  test("q179 termBucket is monotone non-decreasing in UTF8-binary term " +
    "order — incl. the Latin-Extended counterexample that inverted the " +
    "r6 double-clamp (ADVICE r6)") {
    import spark.implicits._
    // "Āz" (U+0100) sorts before "Ła" (U+0141), but the r6 bucket
    // min(cp1,255)*256+min(cp2,255) mapped them to 65402 > 65377 —
    // an order inversion PrefixScan silently turns into wrong ranks.
    val terms = Seq("a", "aa", "az", "zz", "~~", "þ", "ÿ",
      "ÿz", "Āz", "Ła", "Ба", "€", "zĀ")
    val rows = terms.toDF("term")
      .select($"term", Selection.termBucket($"term").as("b"))
      .orderBy($"term") // Spark string sort = UTF-8 byte order
      .collect().map(r => r.getString(0) -> r.getAs[Number](1).longValue)
    val buckets = rows.map(_._2)
    assert(buckets.zip(buckets.tail).forall { case (x, y) => x <= y },
      rows.map { case (t, b) => s"$t:$b" }.mkString(" "))
    // End-to-end: the within-cnt PrefixScan position must equal the
    // window row_number on the same mixed-script vocabulary.
    import org.apache.spark.sql.expressions.Window
    val vocab = terms.toDF("term")
      .withColumn("cnt", lit(1L)).withColumn("one", lit(1L))
    val scanned = graft.operators.PrefixScan.inclusive(
        vocab, Seq("cnt"), "term", Nil, "one", Selection.termBucket, "pos")
      .select($"term", $"pos").as[(String, Long)].collect().toMap
    val expect = vocab.withColumn("rn",
        row_number().over(Window.partitionBy($"cnt").orderBy($"term"))
          .cast("long"))
      .select($"term", $"rn").as[(String, Long)].collect().toMap
    assert(scanned === expect)
  }
  test("q207 coherence scores only held-out docs, with lawful ppm bounds") {
    import spark.implicits._
    val r = Selection.q207.build(spark, sf)
      .select($"doc_id", $"n_big", $"coherence_ppm", $"backoff_ppm", $"oov_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (id, nb, coh, back, oov) =>
      assert(id % 5 === 0L, s"doc $id is from the train split")
      assert(nb >= 1L)
      // a seen-bigram conditional is <= 1; backoff adds 0.4 * unigram
      // <= 0.4 — so the mean is always inside [0, 1e6] ppm
      assert(coh >= 0L && coh <= 1000000L, s"doc $id coherence $coh")
      assert(back >= 0L && back <= 1000000L)
      // an OOV position is necessarily a backed-off position
      assert(oov <= back, s"doc $id: oov_ppm $oov > backoff_ppm $back")
    }
  }
}
