package graft.queries

import graft.SparkSpecBase

/** q206's recall-floor contract (r8 verdict item 4): with every coarse
  * cell probed (nProbe = k), IVF pruning prunes nothing — the
  * candidate set equals the flat scan's, so the IVF-pruned serve must
  * return EXACTLY q202's answer, shortlist ranks, rerank distances and
  * all. Any divergence would mean the pruning path scores or ranks
  * differently from the flat path, not merely "recalls less".
  */
class RagIvfSpec extends SparkSpecBase {

  test("nProbe = k (all cells) degenerates to q202's flat ADC scan") {
    val s = spark
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val flat = key(Pipeline.q202.build(s, sf))
    val ivf = key(Pipeline.ragServeIvf(s, sf, nProbe = 8))
    assert(flat.size === 15)
    assert(ivf === flat)
  }

  test("nProbe = 2 output shape: three queries, <= 5 ranked hits each, " +
    "no self-hits, ranks dense from 1 (exact values are oracle-pinned)") {
    val s = spark
    import s.implicits._
    val rows = Pipeline.q206.build(s, sf)
      .select($"q_id", $"rn", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.map(_._1).distinct.sorted === Seq(0L, 1024L, 2048L))
    assert(rows.forall { case (q, _, v) => q != v })
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1 to rs.length), s"ranks not dense for $q")
    }
  }
}
