package graft.operators

import graft.SparkSpecBase
import graft.queries.Text
import org.apache.spark.sql.functions._

/** Pins GenerationRollover (q245-q247): the rolled-over map equals
  * packing the survivors from scratch, the translation map conserves
  * every surviving token, and the dead-fraction trigger fires on
  * exactly the declared side of the threshold. */
class RolloverSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val L = 128

  private def fixture() = {
    val docs = graft.core.Tables(spark, dir, "documents")
    val map = Text.packingMap(docs, L)
    val deleted = docs.select(col("doc_id")).filter(col("doc_id") % 3 === 0)
    (docs, map, deleted)
  }

  test("rolled-over == packed-from-scratch: the G+1 map (counts derived " +
    "from generation G's segment rows) equals packingMap over the " +
    "surviving documents' text") {
    val (docs, map, deleted) = fixture()
    val (newMap, _) = GenerationRollover.rollover(map, deleted, L)
    val scratch = Text.packingMap(
      docs.join(deleted, Seq("doc_id"), "left_anti"), L)
    val key = Seq("doc_id", "bin_id", "bin_off", "doc_off", "seg_len", "split")
    val got = newMap.select(key.map(col): _*).collect().map(_.toSeq).toSet
    val want = scratch.select(key.map(col): _*).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("translation conservation: spans partition every surviving token — " +
    "per OLD segment they sum to its seg_len, per NEW segment likewise, " +
    "and span offsets stay inside [0, L)") {
    val (_, map, deleted) = fixture()
    val (newMap, trans) = GenerationRollover.rollover(map, deleted, L)
    val live = map.join(deleted.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val oldBad = live.join(
        trans.groupBy(col("doc_id"), col("old_bin_id").as("bin_id"))
          .agg(sum(col("span_len")).as("__sp")),
        Seq("doc_id", "bin_id"), "left_outer")
      .filter(coalesce(col("__sp"), lit(-1L)) =!= col("seg_len"))
    assert(oldBad.isEmpty, "old segments not exactly covered by spans")
    val newBad = newMap.join(
        trans.groupBy(col("doc_id"), col("new_bin_id").as("bin_id"))
          .agg(sum(col("span_len")).as("__sp")),
        Seq("doc_id", "bin_id"), "left_outer")
      .filter(coalesce(col("__sp"), lit(-1L)) =!= col("seg_len"))
    assert(newBad.isEmpty, "new segments not exactly covered by spans")
    val oob = trans.filter(col("span_len") <= 0L ||
      col("old_bin_off") < 0L || col("old_bin_off") >= L ||
      col("new_bin_off") < 0L || col("new_bin_off") >= L ||
      col("old_bin_off") + col("span_len") > L ||
      col("new_bin_off") + col("span_len") > L)
    assert(oob.isEmpty, "span offsets escape the bin")
  }

  test("trigger: the mod-3 set (~1/3 of tokens) fires rolloverIfDue; " +
    "q233's mod-17 set (~6%) is refused with the measured fraction") {
    val (docs, map, deleted) = fixture()
    val ledger = Text.packingTakedown(map, deleted)
    val ppm = GenerationRollover.deadFractionPpm(ledger)
    assert(ppm >= GenerationRollover.ThresholdPpm)
    // fires without throwing
    GenerationRollover.rolloverIfDue(map, ledger, deleted, L)
    val small = docs.select(col("doc_id")).filter(col("doc_id") % 17 === 3)
    val smallLedger = Text.packingTakedown(map, small)
    val smallPpm = GenerationRollover.deadFractionPpm(smallLedger)
    assert(smallPpm < GenerationRollover.ThresholdPpm)
    val e = intercept[IllegalArgumentException] {
      GenerationRollover.rolloverIfDue(map, smallLedger, small, L)
    }
    assert(e.getMessage.contains(s"$smallPpm"))
  }

  test("empty ledger: dead fraction is 0 ppm (no div-by-zero) and the " +
    "reaper refuses") {
    val (_, map, deleted) = fixture()
    val s = spark
    import s.implicits._
    val none = Seq.empty[Long].toDF("doc_id")
    val ledger = Text.packingTakedown(map, none)
    assert(GenerationRollover.deadFractionPpm(ledger) === 0L)
    intercept[IllegalArgumentException] {
      GenerationRollover.rolloverIfDue(map, ledger, none, L)
    }
    val _ = deleted // fixture symmetry
  }

  test("composition: composeTranslations(G0->G1, G1->G2) == the single-" +
    "shot direct G0->G2 translation row for row, and the composed map " +
    "is coalesced-maximal (no adjacent rows are bi-contiguous)") {
    val (docs, map, del1) = fixture()
    val del2 = docs.select(col("doc_id"))
      .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 1)
    val (map1, t01) = GenerationRollover.rollover(map, del1, L)
    val (_, t12) = GenerationRollover.rollover(map1, del2, L)
    val composed = GenerationRollover.composeTranslations(t01, t12)
    val direct = GenerationRollover
      .rollover(map, del1.unionByName(del2), L)._2
    val key = Seq("doc_id", "old_bin_id", "old_bin_off", "new_bin_id",
      "new_bin_off", "span_len")
    val got = composed.select(key.map(col): _*).collect().map(_.toSeq).toSet
    val want = direct.select(key.map(col): _*).collect().map(_.toSeq).toSet
    assert(got === want, "composed chain != single-shot direct translation")
    assert(got.nonEmpty)
    // maximality: no two spans of one doc are adjacent in BOTH coords
    val rows = composed.select(key.map(col): _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    rows.values.foreach { spans =>
      val sorted = spans.sortBy(s => (s._2, s._3))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          val merged = p._2 == n._2 && p._3 + p._6 == n._3 &&
            p._4 == n._4 && p._5 + p._6 == n._5
          assert(!merged, s"mergeable adjacent spans survived: $p | $n")
        case _ => ()
      }
    }
  }
}
