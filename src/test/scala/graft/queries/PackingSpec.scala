package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q209 sequence packing (N45): the concat-and-chunk laws. Checked on
  * the real sf0.001 corpus, not a toy frame — the laws are corpus-
  * independent, so any violation here is an operator bug.
  */
class PackingSpec extends SparkSpecBase {

  private lazy val packed = Text.q209.build(spark, sf).cache()

  test("every bin except the last is exactly full (zero wasted tokens)") {
    val s = spark
    import s.implicits._
    val bins = packed.groupBy($"bin_id").agg(sum($"seg_len").as("fill"))
    val lastBin = bins.agg(max($"bin_id")).head().getLong(0)
    val short = bins.filter($"bin_id" < lastBin && $"fill" =!= 128L)
    assert(short.isEmpty, "a non-final bin is not exactly 128 tokens")
    val lastFill = bins.filter($"bin_id" === lastBin).head().getLong(1)
    assert(lastFill >= 1L && lastFill <= 128L)
  }

  test("per-document segments reassemble the document exactly") {
    val s = spark
    import s.implicits._
    val nTok = graft.core.Tables(s, sf, "documents")
      .select($"doc_id",
        size(filter(split($"text", " "), t => length(t) > 0))
          .cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
    val bad = packed.groupBy($"doc_id").agg(sum($"seg_len").as("covered"))
      .join(nTok, "doc_id")
      .filter($"covered" =!= $"n_tok")
    assert(bad.isEmpty, "segment lengths do not cover the document")
  }

  test("segments are contiguous inside each bin, starting at offset 0") {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"bin_id").orderBy($"bin_off")
    val rows = packed
      .withColumn("prev_end", lag($"bin_off" + $"seg_len", 1).over(w))
      .filter(coalesce($"prev_end", lit(0L)) =!= $"bin_off")
    assert(rows.isEmpty, "gap or overlap inside a bin")
  }

  test("split flag marks exactly the documents spanning several bins") {
    val s = spark
    import s.implicits._
    val bad = packed.groupBy($"doc_id")
      .agg(countDistinct($"bin_id").as("nb"), max($"split").as("sp"))
      .filter(($"nb" > 1) =!= ($"sp" === 1))
    assert(bad.isEmpty, "split flag disagrees with bin span")
  }

  test("doc_off tracks the within-document token position across segments") {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"bin_id")
    val bad = packed
      .withColumn("prev_end", lag($"doc_off" + $"seg_len", 1).over(w))
      .filter(coalesce($"prev_end", lit(0L)) =!= $"doc_off")
    assert(bad.isEmpty, "doc_off not contiguous across a split")
  }

  test("q213 maintained map == full rebuild restricted to the new batch") {
    val s = spark
    import s.implicits._
    val full = Text.q209.build(spark, sf).filter($"doc_id" >= 300)
      .collect().map(_.toSeq).toSet
    val incr = Text.q213.build(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(incr === full, "append-only packing remapped or lost a segment")
    assert(incr.nonEmpty)
  }

  test("q233 takedown ledger: survivors' map rows are untouched (no " +
    "compaction), live+freed reconstructs each bin's exact fill, the " +
    "ledger matches a per-bin brute force, and dead flags exactly the " +
    "fully-freed bins") {
    val s = spark
    import s.implicits._
    val deleted = graft.core.Tables(s, sf, "documents")
      .select($"doc_id").filter($"doc_id" % 17 === 3)
    val ledger = Text.packingTakedown(packed, deleted).cache()
    // non-compaction: the maintained map IS the original minus deleted
    // rows — identical (bin_id, offsets, lengths) for every survivor
    val survivors = packed.join(deleted, Seq("doc_id"), "left_anti")
      .collect().map(_.toSeq).toSet
    val original = packed.filter($"doc_id" % 17 =!= 3)
      .collect().map(_.toSeq).toSet
    assert(survivors === original)
    // fill conservation: live + freed == the bin's original fill
    val fills = packed.groupBy($"bin_id").agg(sum($"seg_len").as("fill"))
    val bad = ledger.join(fills, "bin_id")
      .filter($"live_tokens" + $"freed_tokens" =!= $"fill")
    assert(bad.isEmpty, "ledger does not conserve bin fill")
    // brute force over the collected map (sf0.001-sized)
    val delSet = deleted.collect().map(_.getLong(0)).toSet
    val want = packed.select($"doc_id", $"bin_id", $"seg_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2).map { case (bin, rs) =>
        val (d, l) = rs.partition(r => delSet(r._1))
        bin -> (l.size.toLong, d.size.toLong, l.map(_._3).sum, d.map(_._3).sum,
          if (l.isEmpty) 1 else 0)
      }
    val got = ledger.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    assert(got === want)
    ledger.unpersist()
    ()
  }

  test("q239 cascading takedown: a fingerprint shared with a SURVIVOR " +
    "is never drained; one carried only by deleted docs is; ledger " +
    "conservation holds per store") {
    val s = spark
    import s.implicits._
    // docs 3 and 21 share identical text (same chunk fingerprints);
    // doc 3 is deleted (3 % 17 = 3), 21 survives (21 % 17 = 4) -> the
    // shared md5 keeps a live carrier.
    // doc 37 (37 % 17 = 3, deleted) has unique text -> its md5 drains.
    val docs = Seq(
      (3L, "alpha beta gamma delta"),
      (21L, "alpha beta gamma delta"),
      (37L, "unique solitary phrase here"),
      (5L, "other content words entirely")).toDF("doc_id", "text")
    val deleted = docs.select($"doc_id").filter($"doc_id" % 17 === 3)
    val chunks = Text.chunkWindows(docs, window = 32, stride = 24)
      .select($"doc_id", $"chunk_md5".as("grp"))
    // replicate the q239 ledger algebra for the chunks store
    val led = chunks.join(deleted.withColumn("__del", lit(1L)),
        Seq("doc_id"), "left_outer")
      .withColumn("__del", coalesce($"__del", lit(0L)))
      .groupBy($"grp")
      .agg(sum(lit(1L) - $"__del").as("live"), sum($"__del").as("rem"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val sharedMd5 = chunks.filter($"doc_id" === 21L).head().getString(1)
    val uniqueMd5 = chunks.filter($"doc_id" === 37L).head().getString(1)
    assert(led(sharedMd5) === ((1L, 1L)), "shared fingerprint must keep a live carrier")
    assert(led(uniqueMd5) === ((0L, 1L)), "unique deleted fingerprint must drain")
    // full-query conservation: n_before == n_removed + n_live per store
    val rows = Text.q239.build(s, sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"store ${r.getString(0)} does not conserve rows")
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("q215 shards partition the bins and conserve tokens exactly") {
    val s = spark
    import s.implicits._
    val shards = Text.q215.build(spark, sf).cache()
    val bins = packed.groupBy($"bin_id").agg(sum($"seg_len").as("fill"))
    // every bin in exactly one shard: shard bin counts sum to the bin count
    val (nBins, nToks) = (bins.count(),
      bins.agg(sum($"fill")).head().getLong(0))
    val agg = shards.agg(sum($"n_bins"), sum($"n_tokens")).head()
    assert(agg.getLong(0) === nBins, "shards lost or duplicated a bin")
    assert(agg.getLong(1) === nToks, "shard token totals diverge from bins")
    // every shard except at most one is exactly 16 bins
    assert(shards.filter($"n_bins" =!= 16L).count() <= 1)
    shards.unpersist(); ()
  }

  test("q223 epoch schedule: quotas sum to the 200-doc budget, and the " +
    "append law holds ON the mixture-selected corpus — a second epoch " +
    "batch packs against the frozen total without remapping a bin") {
    val s = spark
    import s.implicits._
    val epoch = Text.q223.build(spark, sf).cache()
    assert(epoch.select($"doc_id").distinct().count() === 200L,
      "mixture selection did not realize the 200-document epoch budget")
    // non-final bins exactly full even through selection
    val bins = epoch.groupBy($"bin_id").agg(sum($"seg_len").as("fill"))
    val lastBin = bins.agg(max($"bin_id")).head().getLong(0)
    assert(bins.filter($"bin_id" < lastBin && $"fill" =!= 128L).isEmpty)
    // q213's law on the SELECTED corpus: split it at the median picked
    // id, pack the tail against the head's frozen token total, and the
    // maintained rows must equal the full epoch map restricted
    val ids = epoch.select($"doc_id").distinct()
      .orderBy($"doc_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val nTok = graft.core.Tables(s, sf, "documents")
      .select($"doc_id",
        size(filter(split($"text", " "), t => length(t) > 0))
          .cast("long").as("n_tok"))
    val sel = nTok.filter($"doc_id".isInCollection(ids))
    val frozenTotal = sel.filter($"doc_id" < cut)
      .agg(coalesce(sum($"n_tok"), lit(0L)).as("off"))
    val maintained = Text.packingMapFromCounts(
        sel.filter($"doc_id" >= cut), L = 128, offset = Some(frozenTotal))
      .collect().map(_.toSeq).toSet
    val restricted = epoch.filter($"doc_id" >= cut)
      .select($"doc_id", $"bin_id", $"bin_off", $"doc_off", $"seg_len", $"split")
      .collect().map(_.toSeq).toSet
    assert(maintained === restricted,
      "mixture-selected packing is not append-stable")
    epoch.unpersist(); ()
  }
}
