package graft.queries

import graft.SparkSpecBase

/** q202's composite-id injectivity guard (r8 verdict item 7): the
  * doc·1024+chunk id is only injective while every document chunks
  * into < 1024 windows. The guard is a per-row `raise_error` inside
  * the id projection — no eager corpus-scan job at query build (the
  * old form ran `agg(max).head` even when the result was never
  * consumed); it fires with the first real action that touches the
  * offending row and names the doc.
  */
class RagGuardSpec extends SparkSpecBase {

  test("q202 composite-id guard fires loud on a planted >1024-chunk doc") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ragguard").toString
    // 25000 tokens -> (25000-33)//24 + 2 = 1042 chunk starts -> ids past 1024
    val big = (0 until 25000).map(i => s"t${i % 97}").mkString(" ")
    (Seq((0L, big)) ++ (1L to 4L).map(i => (i, "a b c d e")))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Throwable] {
      // build alone already triggers the guard via the PQ trainer's
      // sanctioned seed collect; collect() makes the trigger explicit
      Pipeline.q202.build(s, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("q202 composite chunk id overflows")),
      s"guard did not fire; got: ${msgs(e).mkString(" | ")}")
  }

  test("q202 guard is silent on an in-bound corpus and the id stays exact") {
    val s = spark
    import s.implicits._
    val out = Pipeline.q202.build(s, sf).select("q_id", "rn").collect()
    assert(out.nonEmpty && out.forall(_.getInt(1) <= 5))
  }
}
