package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact-substring (repeated-span) deduplication — the ExactSubstr
  * protocol of Lee et al. '22 ("Deduplicating Training Data Makes
  * Language Models Better", §4.1): find every maximal token span that
  * occurs more than once ANYWHERE in the corpus (across documents or
  * repeated within one), and optionally scrub it from the training
  * text. This is the span-level member of the dedup family: q49 drops
  * whole identical documents, MinHash/SimHash (q54/q55) drop NEAR
  * duplicate documents, winnowing (q95/q107) FINGERPRINTS local
  * overlap for pairing — ExactSubstr is the only one that localizes
  * and REMOVES the overlapping bytes themselves, the form the paper
  * shows memorization actually rides on.
  *
  * Algorithm (Spark-native; the paper builds one giant suffix array,
  * which is inherently single-machine): a token k-gram occurs in some
  * duplicated span of length >= k iff its hash has corpus frequency
  * > 1, so
  *   1. emit every k-gram occurrence as (doc, pos, hash) — hashes are
  *      60-bit md5 prefixes, text never leaves the scan stage;
  *   2. aggregate gram frequency and keep hashes with count > 1
  *      (map-side partial counts absorb viral boilerplate grams);
  *   3. semi-join occurrences against the duplicated-hash set (each
  *      occurrence matches at most once — a stop-boilerplate gram
  *      CANNOT fan out, unlike a pair join);
  *   4. per document, merge duplicated gram starts into maximal spans
  *      with one ordered gaps-and-islands window (new island when the
  *      next start is > k after the previous — i.e. the k-wide covers
  *      neither overlap nor touch).
  * A span of L >= k duplicated tokens yields starts at every position
  * p with p + k - 1 <= L, so islands reconstruct exactly [1, L] — the
  * paper's maximal-match semantics at k-token resolution.
  *
  * Scale posture: the frequency aggregate is the dominant shuffle —
  * 8-byte keys with partial aggregation, the same shape as q16's
  * count-distinct. Step 3 re-shuffles occurrences on the hash; on a
  * 100 TB corpus the exact semi-join can be replaced by a Bloom filter
  * of the duplicated-hash set evaluated map-side ([[BloomPrune]]'s
  * device, one scan saved, false positives only ADD spans) — kept
  * exact here because the oracle demands it. The islands window is
  * partitioned by document (bounded by document length), never global.
  *
  * Scrub policy: `scrub` drops EVERY occurrence of a duplicated span
  * (drop-all). Lee et al. keep one occurrence chosen by suffix-array
  * order; after island-merging, "the one to keep" is ill-defined
  * (overlapping islands from different partners differ per document),
  * and drop-all is the conservative variant several open reproductions
  * ship. Documents shorter than k tokens have no grams and pass
  * through unchanged; a fully-covered document survives as an empty
  * string (callers drop or backfill — the decision row remains).
  */
object ExactSubstr {

  /** Maximal duplicated spans per document: (id, span_start, span_end,
    * span_tokens), token positions 1-based inclusive, ordered within a
    * document by disjoint ascending spans. `k` is the minimum
    * duplicated run length detected (the paper uses 50 BPE tokens at
    * production scale). */
  def duplicatedSpans(corpus: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, s"minimum span length must be >= 2 tokens, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val occ = gramOccurrences(corpus, idCol, textCol, k)
    val dup = occ.groupBy($"gh").agg(count(lit(1)).as("c"))
      .filter($"c" > 1).select($"gh")
    val hits = occ.join(dup, Seq("gh"), "left_semi")
    val byDoc = Window.partitionBy(col(idCol)).orderBy($"pos")
    hits
      .withColumn("brk",
        when($"pos" - lag($"pos", 1).over(byDoc) > k, 1L).otherwise(0L))
      .withColumn("isl", sum($"brk").over(byDoc))
      .groupBy(col(idCol), $"isl")
      .agg(min($"pos").as("span_start"),
        (max($"pos") + (k - 1)).as("span_end"))
      .select(col(idCol), $"span_start", $"span_end",
        ($"span_end" - $"span_start" + 1).as("span_tokens"))
  }

  /** Drop-all scrub: every token covered by a duplicated span is
    * removed; (id, n_tokens, n_kept, clean_text) for EVERY corpus row
    * (fully-scrubbed documents keep their row with clean_text = ''). */
  def scrub(corpus: DataFrame, idCol: String, textCol: String,
            k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val spans = duplicatedSpans(corpus, idCol, textCol, k)
      .select(col(idCol).as("s_id"), $"span_start", $"span_end")
    val toks = corpus.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("p0", "tok")))
      .select(col(idCol), ($"p0" + 1).cast(LongType).as("pos"), $"tok")
    val kept = toks.join(spans,
      col(idCol) === $"s_id" && $"pos".between($"span_start", $"span_end"),
      "left_anti")
    val agg = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct($"pos", $"tok"))),
          s => s.getField("tok"))).as("clean_text"))
    corpus
      .select(col(idCol),
        size(split(col(textCol), " ")).cast(LongType).as("n_tokens"))
      .join(agg, Seq(idCol), "left_outer")
      .select(col(idCol), $"n_tokens",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"clean_text", lit("")).as("clean_text"))
  }

  /** Every k-gram occurrence as (id, pos, gh): pos 1-based, gh the
    * 60-bit md5 prefix of the space-joined gram (the engine-agnostic
    * q145 scheme, so a DuckDB twin reproduces every hash). */
  private[operators] def gramOccurrences(corpus: DataFrame, idCol: String,
                                         textCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .filter(size($"toks") >= k)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
            i -> struct(CAST(i AS BIGINT) AS pos,
                        concat_ws(' ', slice(toks, i, $k)) AS gram))"""))
        .as("g"))
      .select(col(idCol), $"g.pos".as("pos"),
        conv(substring(md5($"g.gram"), 1, 15), 16, 10)
          .cast(LongType).as("gh"))
  }
}
