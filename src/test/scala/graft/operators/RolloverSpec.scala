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
}
