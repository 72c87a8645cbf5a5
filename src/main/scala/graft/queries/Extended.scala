package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables, Exact}
import graft.functions.{Profiler, VectorOps}
import graft.operators.{BloomPrune, IntervalJoin, SaltedJoin, TableDiff}
import Exact._

/** Round-2 surface extensions: pivot, subqueries, deterministic dataset
  * splits, column profiling, IVF-style ANN, skew-salted joins, and
  * subword token accounting — the remaining operations a reference user
  * running a large-scale training-data pipeline would reach for
  * (SURVEY.md §2.12).
  */
object Extended {

  /** q65 — pivot: order counts per priority x status (A11). Pivot values
    * are declared explicitly — at scale, letting Spark discover them is
    * an extra full pass over the data. */
  val q65 = Q(
    "q65_pivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "A11: pivot with declared values = one aggregate, no discovery pass; " +
      "missing cells filled 0 to match FILTER-count semantics")

  /** q66 — subquery surface (P7): scalar subquery, correlated EXISTS,
    * uncorrelated IN. Catalyst decorrelates EXISTS/IN into semi-joins —
    * asserted in PlanSpec; identical SQL text runs on both engines.
    * The scalar threshold uses MAX (exact) — an AVG of doubles would be
    * partition-order-dependent and can never hash-match. */
  val q66 = Q.sql(
    "q66_subqueries",
    """SELECT c_custkey, c_name, c_acctbal
       FROM customer c
       WHERE c_acctbal > (SELECT MAX(c_acctbal) FROM customer) * 0.95
         AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
       ORDER BY c_custkey""",
    """SELECT c_custkey, c_name, c_acctbal
       FROM customer c
       WHERE c_acctbal > (SELECT MAX(c_acctbal) FROM customer) * 0.95
         AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
       ORDER BY c_custkey""",
    doc = "P7: scalar + EXISTS + IN subqueries; decorrelated to semi-joins by Catalyst")

  /** q67 — deterministic train/validation/test split (X12): bucket =
    * md5(doc_id || salt) % 100 → 80/10/10. Hash-based (not random) so
    * the split is stable across runs, engines, and re-partitioning —
    * the property a training pipeline needs so examples never migrate
    * between train and eval sets when data is re-processed. */
  val q67 = Q(
    "q67_hash_split",
    (s, dir) => {
      import s.implicits._
      val bucket = (conv(
        substring(md5(concat($"doc_id".cast(StringType), lit(":split"))), 1, 4),
        16, 10).cast(IntegerType) % 100).as("bucket")
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang", bucket)
        .withColumn("split",
          when($"bucket" < 80, "train")
            .when($"bucket" < 90, "validation")
            .otherwise("test"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(doc_id || ':split'), 1, 4)) AS INT) % 100 AS bucket,
             CASE WHEN CAST(('0x' || substr(md5(doc_id || ':split'), 1, 4)) AS INT) % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(doc_id || ':split'), 1, 4)) AS INT) % 100 < 90 THEN 'validation'
                  ELSE 'test' END AS split
      FROM documents ORDER BY doc_id"""),
    doc = "X12: hash-bucket dataset split — stable under reprocessing, no RNG state")

  /** q68 — single-pass column profiler over customer (X13): null count,
    * exact distinct, min/max per column; one scan + one shuffle of
    * partial aggregate states regardless of column count. */
  val q68 = Q(
    "q68_profile",
    (s, dir) => Profiler
      .profile(Tables(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
      .orderBy(col("column")),
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS "column",
               CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT $c) AS n_distinct,
               CAST(MIN($c) AS VARCHAR) AS min_str,
               CAST(MAX($c) AS VARCHAR) AS max_str
            FROM customer"""
      Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
        .map(one).mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY \"column\"")
    },
    doc = "X13: data-quality profile in ONE aggregation (DuckDB twin needs 4 scans)")

  /** q69 — IVF-style ANN (N13, the 100 TB similarity-search path):
    * 8 deterministic coarse centroids (vec_id < 8), every vector
    * assigned to its nearest centroid (exact L2, ties to smaller id),
    * then each query searches ONLY its own cluster — the inverted-file
    * pruning that replaces an O(N) scan per query with O(N/k).
    * All distances are sequential folds (VectorOps contract) so
    * assignment and ranking are bit-identical cross-engine.
    *
    * This fixed 1-probe form is the oracle-able contract; the tunable
    * scale path is [[graft.operators.IvfAnn]], whose scaladoc carries
    * the measured probe-count/recall trade-off table and whose spec
    * pins recall floors (structureless ≥ 0.8·nProbe/k, clustered
    * ≥ 0.95 at one probe, exactly 1.0 at nProbe = k). */
  val q69 = Q(
    "q69_ivf_ann",
    (s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
      // (a - 2b) + c association matches the oracle text exactly.
      val d2 = (VectorOps.normSq($"embedding") -
        lit(2.0) * VectorOps.dot($"embedding", $"c_vec")) +
        VectorOps.normSq($"c_vec")
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d2".asc, $"c_id".asc)
      val assign = emb.crossJoin(broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1)
        .select($"vec_id", $"embedding", $"c_id")
        .persist() // consumed twice (probe + candidates); tiny vs corpus
      val queries = assign.filter($"vec_id" >= 8 && $"vec_id" < 12)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"c_id".as("q_cid"))
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
      assign.join(broadcast(queries),
          $"c_id" === $"q_cid" && $"vec_id" =!= $"q_id")
        .withColumn("cos", VectorOps.cosine($"q_vec", $"embedding"))
        .withColumn("rn", row_number().over(wTop))
        .filter($"rn" <= 3)
        .select($"q_id", $"rn", $"vec_id", $"cos")
        .orderBy($"q_id", $"rn")
    },
    Some {
      val dA = s"(${VectorOps.dotSql("e.embedding", "e.embedding")} - 2 * ${VectorOps.dotSql("e.embedding", "c.c_vec")}) + ${VectorOps.dotSql("c.c_vec", "c.c_vec")}"
      s"""
      WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
      a AS (SELECT e.vec_id, e.embedding, c.c_id, $dA AS d2
            FROM embeddings e, cents c),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn FROM a),
      assign AS (SELECT vec_id, embedding, c_id FROM r WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, embedding AS q_vec, c_id AS q_cid
            FROM assign WHERE vec_id >= 8 AND vec_id < 12),
      cand AS (SELECT q.q_id, a.vec_id,
                 ${VectorOps.cosineSql("q.q_vec", "a.embedding")} AS cos
               FROM assign a JOIN q ON a.c_id = q.q_cid AND a.vec_id <> q.q_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn FROM cand)
      SELECT q_id, rn, vec_id, cos FROM rr WHERE rn <= 3
      ORDER BY q_id, rn"""
    },
    doc = "N13: IVF coarse quantization — centroid assignment prunes the search " +
      "to one cluster per query; brute-force q50 is the recall=1 baseline")

  /** q70 — salted skew join (J11): events (5 hot event_type keys
    * carrying ~20% of all rows EACH) joined to a per-type dim through
    * SaltedJoin. The result equals the plain join — the oracle runs the
    * unsalted twin — while the shuffle spreads each hot key over 8
    * reducers instead of 1. */
  val q70 = Q(
    "q70_salted_join",
    (s, dir) => {
      import s.implicits._
      val events = Tables(s, dir, "events")
      val dim = events.select($"event_type").distinct()
        .withColumn("type_code", length($"event_type"))
      SaltedJoin.join(events, dim, "event_type", salts = 8)
        .groupBy($"event_type", $"type_code")
        .agg(count(lit(1)).as("n"), dsum($"value").as("value_sum"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH dim AS (SELECT DISTINCT event_type, length(event_type) AS type_code FROM events)
      SELECT e.event_type, d.type_code, COUNT(*) AS n,
             ${sqlDsum("value")} AS value_sum
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY e.event_type, d.type_code ORDER BY e.event_type"""),
    doc = "J11: salting = pure physical redistribution; result identical to plain join")

  /** q71 — subword token accounting (N14): word count, word+punct token
    * count, and a BPE-shaped piece estimate (ceil(len/4) pieces per
    * word — the 'one piece per ~4 chars' rule of thumb) — the cost
    * model a pipeline uses to budget LLM training tokens per document. */
  val q71 = Q(
    "q71_token_count",
    (s, dir) => {
      import s.implicits._
      val words = regexp_extract_all($"text", lit("\\w+"), lit(0))
      Tables(s, dir, "documents")
        .select($"doc_id",
          size(words).as("n_words"),
          size(regexp_extract_all($"text", lit("\\w+|[^\\w\\s]"), lit(0))).as("n_tokens"),
          aggregate(words, lit(0L),
            (acc, t) => acc + floor((length(t) + lit(3)) / lit(4)).cast(LongType))
            .as("n_pieces"),
          when(size(words) > 0, length($"text").cast(DoubleType) / size(words))
            .as("chars_per_word"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH w AS (SELECT doc_id, text, regexp_extract_all(text, '\w+') AS words FROM documents)
      SELECT doc_id,
             len(words) AS n_words,
             len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens,
             COALESCE(CAST(list_sum(list_transform(words, t -> CAST(floor((length(t) + 3) / 4) AS BIGINT))) AS BIGINT), 0) AS n_pieces,
             CASE WHEN len(words) > 0 THEN CAST(length(text) AS DOUBLE) / len(words) END AS chars_per_word
      FROM w ORDER BY doc_id"""),
    doc = "N14: token/piece budgeting — zero-UDF regex + HOF fold, codegen'd")

  /** q72 — bucketed interval self-join (J9 generic path): overlapping
    * 30-day windows of high-value orders, counted per start-year. The
    * Spark side runs graft.operators.IntervalJoin (equi-join on day-grid
    * cells — no nested-loop, no broadcast of a big side); the oracle
    * brute-forces the same pairs, proving the bucketing is lossless and
    * emits each pair exactly once. */
  val q72 = Q(
    "q72_interval_bucket_join",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .filter($"o_totalprice" > 480000)
        .select($"o_orderkey", to_date($"o_orderdate").as("start_d"),
          date_add(to_date($"o_orderdate"), 30).as("end_d"))
      IntervalJoin.overlap(o, o, "start_d", "end_d", bucketWidthDays = 30)
        .filter($"a_o_orderkey" < $"b_o_orderkey")
        .groupBy(year($"a_start_d").as("y"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"y")
    },
    Some("""
      WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
                        CAST(o_orderdate AS DATE) + 30 AS end_d
                 FROM orders WHERE o_totalprice > 480000)
      SELECT CAST(extract(year FROM a.start_d) AS INT) AS y, COUNT(*) AS n_pairs
      FROM o a JOIN o b
        ON a.start_d < b.end_d AND b.start_d < a.end_d
       AND a.o_orderkey < b.o_orderkey
      GROUP BY 1 ORDER BY 1"""),
    doc = "J9 generic: day-grid cells turn interval overlap into an equi-join; " +
      "witness-cell filter dedupes without a global distinct")

  /** q73 — repetition-based quality filters (X14, the Gopher-style
    * signals): top-token fraction and duplicate-bigram fraction per
    * document, with the keep/drop verdict. Everything is per-row HOF
    * math — computed scan-local with ZERO shuffles, which is the right
    * shape for a 100 TB quality pass. */
  val q73 = Q(
    "q73_quality_filters",
    (s, dir) => {
      import s.implicits._
      val tokens = split($"text", " ")
      val n = size(tokens)
      val bigrams = zip_with(
        slice(tokens, lit(1), n - 1), slice(tokens, lit(2), n - 1),
        (x, y) => concat_ws(" ", x, y))
      // top token count = longest equal-run over the SORTED tokens: one
      // O(n log n) pass per row. The distinct×filter spelling is the
      // nested-lambda O(n·d) trap (q95/q106's lesson) — HOF lambdas are
      // interpreted, so the quadratic form costs real seconds at sf0.1
      // and would be fatal on book-length documents. The DuckDB twin
      // keeps the textbook distinct-count form; the integers agree.
      val topTf = expr(
        """aggregate(array_sort(split(text, ' ')),
             named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
             (a, t) -> named_struct(
               'prev', t,
               'run',  IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1, 1),
               'best', greatest(a.best,
                 IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1, 1))),
             a -> a.best)""")
      Tables(s, dir, "documents")
        .select($"doc_id",
          n.as("n_tokens"),
          (topTf.cast(DoubleType) / n).as("top_token_frac"),
          when(size(bigrams) > 0,
            lit(1.0) - size(array_distinct(bigrams)).cast(DoubleType) / size(bigrams))
            .otherwise(0.0).as("dup_bigram_frac"))
        .withColumn("keep",
          $"top_token_frac" <= 0.2 && $"dup_bigram_frac" <= 0.3)
        .orderBy($"doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
           b AS (SELECT doc_id, tokens, len(tokens) AS n,
                   list_transform(range(1, len(tokens)), i -> tokens[i] || ' ' || tokens[i + 1]) AS bigrams
                 FROM t),
           f AS (SELECT doc_id, n AS n_tokens,
                   CAST(list_max(list_transform(list_distinct(tokens),
                     d -> len(list_filter(tokens, t -> t = d)))) AS DOUBLE) / n AS top_token_frac,
                   CASE WHEN len(bigrams) > 0
                        THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
                        ELSE 0.0 END AS dup_bigram_frac
                 FROM b)
      SELECT doc_id, n_tokens, top_token_frac, dup_bigram_frac,
             top_token_frac <= 0.2 AND dup_bigram_frac <= 0.3 AS keep
      FROM f ORDER BY doc_id"""),
    doc = "X14: repetition quality signals, shuffle-free per-row math — " +
      "run-length top-token count over sorted tokens, linear per row")

  /** q74 — PII-shaped redaction (X15): mask digit runs and URLs in the
    * events props payload, counting masked spans. regexp_replace is
    * per-row and codegen'd — the scrub pass costs one scan. */
  val q74 = Q(
    "q74_redact",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_id",
          size(regexp_extract_all($"props", lit("[0-9]+"), lit(0))).as("n_masked"),
          regexp_replace(
            regexp_replace($"props", "https?://\\S+", "<url>"),
            "[0-9]+", "<num>").as("redacted"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
             len(regexp_extract_all(props, '[0-9]+')) AS n_masked,
             regexp_replace(regexp_replace(props, 'https?://\S+', '<url>', 'g'),
                            '[0-9]+', '<num>', 'g') AS redacted
      FROM events ORDER BY event_id"""),
    doc = "X15: deterministic scrub pass — chained global regex replaces, one scan")

  /** q75 — unpivot/melt (A12, the pivot inverse): three lineitem
    * measures melted to (metric, value) rows, then profiled per metric.
    * Melt multiplies rows BEFORE the aggregate, but the aggregate keys
    * on `metric` (3 groups) and partials collapse map-side, so the
    * shuffle stays tiny at any scale. */
  val q75 = Q(
    "q75_unpivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice", $"l_discount")
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount"),
          "metric", "value")
        .groupBy($"metric")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"),
          min($"value").as("vmin"), max($"value").as("vmax"))
        .orderBy($"metric")
    },
    Some(s"""
      WITH u AS (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
      SELECT metric, COUNT(*) AS n, ${sqlDsum("value")} AS total,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM u GROUP BY metric ORDER BY metric"""),
    doc = "A12: unpivot -> 3-group aggregate; map-side partials keep the shuffle tiny")

  /** q76 — geo bounding-box + proximity profile (G1; the reference's
    * lat/lon capability, README.md:84-86): deterministic synthetic
    * coordinates from customer keys, bbox filter, per-segment counts
    * and micro-quantized squared-degree proximity sums. Trig-based
    * haversine lives in graft.functions.Geo under ScalaTest (libm
    * rounding is not oracle-safe); this query is pure arithmetic. */
  val q76 = Q(
    "q76_geo_bbox",
    (s, dir) => {
      import s.implicits._
      // md5-scattered synthetic coordinates: uniform over the globe for
      // ANY key range (raw `key/100` formulas collapse small corpora
      // onto one latitude band)
      val lat = conv(substring(md5(concat($"c_custkey".cast(StringType), lit(":lat"))), 1, 6),
        16, 10).cast(LongType) % 18000 / 100.0 - 90.0
      val lon = conv(substring(md5(concat($"c_custkey".cast(StringType), lit(":lon"))), 1, 6),
        16, 10).cast(LongType) % 36000 / 100.0 - 180.0
      Tables(s, dir, "customer")
        .withColumn("lat", lat).withColumn("lon", lon)
        .filter(graft.functions.Geo.inBBox($"lat", $"lon", -60, -120, 60, 120))
        .withColumn("dist_sq",
          graft.functions.Geo.degreeDistSq($"lat", $"lon", lit(0.0), lit(0.0)))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_in_box"),
          (sum(graft.functions.VectorOps.micros($"dist_sq")).cast(DoubleType) / 1e6)
            .as("dist_sq_sum"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      WITH g AS (
        SELECT c_mktsegment,
               CAST(('0x' || substr(md5(c_custkey || ':lat'), 1, 6)) AS BIGINT) % 18000 / 100.0 - 90.0 AS lat,
               CAST(('0x' || substr(md5(c_custkey || ':lon'), 1, 6)) AS BIGINT) % 36000 / 100.0 - 180.0 AS lon
        FROM customer),
      f AS (
        SELECT c_mktsegment,
               (lat - 0.0) * (lat - 0.0) + (lon - 0.0) * (lon - 0.0) AS dist_sq
        FROM g
        WHERE lat >= -60 AND lat < 60 AND lon >= -120 AND lon < 120)
      SELECT c_mktsegment, COUNT(*) AS n_in_box,
             CAST(SUM(CAST(CAST(dist_sq AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000
               AS dist_sq_sum
      FROM f GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    doc = "G1: bbox pushdown-able predicate + exact micro-quantized proximity sums")

  /** q77 — fuzzy string matching via edit distance (N15): near-identical
    * customer-name pairs in a bounded slice. Levenshtein is O(len²) per
    * pair, so the scale posture is ALWAYS candidate-generation first
    * (LSH/banding, q54-q56) with edit distance as the verify step on the
    * rare survivors — this query is that verify step in isolation. */
  val q77 = Q(
    "q77_fuzzy_match",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").filter($"c_custkey" < 100)
        .select($"c_custkey", $"c_name")
      val a = c.select($"c_custkey".as("a_id"), $"c_name".as("a_name"))
      val b = c.select($"c_custkey".as("b_id"), $"c_name".as("b_name"))
      a.join(b, $"a_id" < $"b_id")
        .withColumn("dist", levenshtein($"a_name", $"b_name"))
        .filter($"dist" <= 2)
        .select($"a_id", $"b_id", $"dist")
        .orderBy($"a_id", $"b_id")
    },
    Some("""
      WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100)
      SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
             CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 2
      ORDER BY a_id, b_id"""),
    doc = "N15: edit-distance verify step; at scale always behind LSH candidate gen")

  /** q78 — distribution rank functions (W6): percent_rank and cume_dist
    * are count ratios (exact int/int IEEE divides), so unlike arbitrary
    * float windows they oracle-hash cleanly.
    *
    * Scale shape: `OVER (PARTITION BY o_orderstatus ...)` is a 3-value
    * partition key — one task per status at any cluster size, the
    * r4-flagged skew family. The ordering key (price, orderkey) is
    * unique, so every row's rank is its global position, and
    * [[graft.operators.PrefixScan]] with weight 1 computes exactly
    * that: local row counts inside (status, price-bucket) slices plus
    * broadcast bucket offsets. percent_rank = (rank-1)/(n-1) and
    * cume_dist = rank/n on the same BIGINTs the window functions would
    * produce, so the IEEE divides — and the oracle hashes — are
    * bit-identical. One data-sized shuffle, same as the skewed form,
    * minus the 3-task cap. */
  val q78 = Q(
    "q78_rank_dist",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val scanned = PrefixScan.inclusive(
        Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
            lit(1L).as("one")),
        Seq("o_orderstatus"), "o_totalprice", Seq("o_orderkey"), "one",
        _ / 10000d, "rk", Some("n"))
      scanned
        .select($"o_orderkey", $"o_orderstatus",
          // n=1 guard: the window form defines percent_rank = 0.0 for a
          // single-row partition; the raw divide would be 0/0 = NaN
          when($"n" === 1, lit(0.0d))
            .otherwise(($"rk" - 1).cast("double") / ($"n" - 1).cast("double"))
            .as("pct_rank"),
          ($"rk".cast("double") / $"n".cast("double")).as("cume"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderstatus,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""),
    doc = "W6: distribution ranks — exact count-ratio semantics via " +
      "tie-run row_number + PrefixScan prefix counts (no 3-task status window)")

  /** q79 — sliding-window document chunking (X16): split each document
    * into 16-token chunks with 4-token overlap (stride 12) — the
    * context-window prep step for embedding/RAG pipelines. Pure per-row
    * array math (sequence + slice) exploded to one row per chunk; the
    * chunk text never exists twice (no self-join, no shuffle before the
    * final sort). */
  val q79 = Q(
    "q79_chunk_windows",
    (s, dir) => {
      import s.implicits._
      val size16 = 16
      val stride = 12
      val tokens = split($"text", " ")
      val n = size(tokens)
      // chunk starts: 1, 1+stride, ... A start past n-overlap would yield a
      // chunk fully contained in the previous one (pure duplicate downstream
      // embeddings), so the bound is n - overlap; greatest(...,1) keeps one
      // chunk for short docs. Null text is dropped explicitly — Spark's
      // sequence(NULL) drops the row but DuckDB's greatest SKIPS nulls, so
      // without the filter the two sides disagree on row count.
      val starts = sequence(lit(1), greatest(n - (size16 - stride), lit(1)), lit(stride))
      Tables(s, dir, "documents")
        .filter($"text".isNotNull)
        .select($"doc_id", tokens.as("tokens"), posexplode(starts).as(Seq("pos", "start")))
        .select($"doc_id", ($"pos" + 1).as("chunk_id"),
          concat_ws(" ", slice($"tokens", $"start", lit(size16))).as("chunk"),
          least(size($"tokens") - $"start" + 1, lit(size16)).as("chunk_tokens"))
        .orderBy($"doc_id", $"chunk_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens
                 FROM documents WHERE text IS NOT NULL),
      c AS (SELECT doc_id, tokens,
              unnest(range(1, greatest(len(tokens) - 4, 1) + 1, 12)) AS start
            FROM t)
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) AS INT) AS chunk_id,
             array_to_string(tokens[start:start + 15], ' ') AS chunk,
             CAST(least(len(tokens) - start + 1, 16) AS INT) AS chunk_tokens
      FROM c ORDER BY doc_id, chunk_id"""),
    doc = "X16: overlapping chunk windows for embedding/RAG prep — per-row " +
      "sequence+slice, chunks born exploded (no self-join)")

  /** q80 — deterministic stratified sample (X17): exactly 3 documents
    * per language, chosen by md5 rank — reprocessing-stable (same
    * sample every run, any partitioning), the property a train-set
    * sampler needs. Two-phase at scale: the rank window keys on the
    * stratum only after an (optional) salted pre-prune. */
  val q80 = Q(
    "q80_stratified_sample",
    (s, dir) => {
      import s.implicits._
      val rankKey = md5(concat($"doc_id".cast(StringType), lit(":sample")))
      // q29's two-phase salted top-k: a window over |langs| keys caps
      // parallelism at a handful of reducers at any cluster size (the
      // r5 audit's skew family); phase 1 keeps 3 per (lang, salt),
      // phase 2 ranks the <= langs*salts*3 survivors — identical rows.
      val salted = Window.partitionBy($"lang", $"__salt")
        .orderBy($"rank_key", $"doc_id")
      val w = Window.partitionBy($"lang").orderBy($"rank_key", $"doc_id")
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang", rankKey.as("rank_key"),
          pmod(hash($"doc_id"), lit(32)).as("__salt"))
        .withColumn("srn", row_number().over(salted))
        .filter($"srn" <= 3)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"lang", $"rn", $"doc_id")
        .orderBy($"lang", $"rn")
    },
    Some("""
      WITH k AS (SELECT doc_id, lang, md5(doc_id || ':sample') AS rank_key FROM documents),
      r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rank_key, doc_id) AS rn FROM k)
      SELECT lang, CAST(rn AS INT) AS rn, doc_id FROM r WHERE rn <= 3
      ORDER BY lang, rn"""),
    doc = "X17: md5-rank stratified sampling — deterministic, partitioning-invariant")

  /** q81 — time-series resample + forward fill (X18): per-user hourly
    * grid spanning each user's activity, hour-bucket aggregates joined
    * onto the spine, gaps carried forward with last(ignoreNulls). The
    * spine is generated per key (sequence+explode — no cross join with
    * a global calendar), and the fill is one window over the grid. */
  val q81 = Q(
    "q81_resample_ffill",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").filter($"user_id" < 20)
      val bounds = ev.groupBy($"user_id")
        .agg(date_trunc("hour", min($"ts")).as("lo"),
          date_trunc("hour", max($"ts")).as("hi"))
      val spine = bounds.select($"user_id",
        explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("slot"))
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts").as("slot"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("v"))
      val w = Window.partitionBy($"user_id").orderBy($"slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("user_id", "slot"), "left_outer")
        .select($"user_id", $"slot",
          coalesce($"n_events", lit(0L)).as("n_events"),
          last($"v", ignoreNulls = true).over(w).as("v_ffill"))
        .orderBy($"user_id", $"slot")
    },
    Some(s"""
      WITH ev AS (SELECT * FROM events WHERE user_id < 20),
      b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM ev GROUP BY user_id),
      spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
      h AS (SELECT user_id, date_trunc('hour', ts) AS slot,
                   COUNT(*) AS n_events, ${sqlDsum("value")} AS v
            FROM ev GROUP BY 1, 2),
      j AS (SELECT s.user_id, s.slot, COALESCE(h.n_events, 0) AS n_events, h.v
            FROM spine s LEFT JOIN h ON s.user_id = h.user_id AND s.slot = h.slot)
      SELECT user_id, slot, n_events,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      FROM j ORDER BY user_id, slot"""),
    doc = "X18: per-key spine + hour aggregate + ignoreNulls forward fill — " +
      "gap filling without a global calendar cross join")

  /** q84 — bloom-pruned semi-join (X19): lineitems restricted to a
    * selective part subset. BloomPrune builds a ~KB filter over the dim
    * keys and drops non-matching fact rows BEFORE the exchange; the
    * exact semi-join then removes bloom false positives, so the result
    * is the plain semi-join's — which is what the oracle runs. At 100 TB
    * this is the difference between shuffling the whole fact table and
    * shuffling the ~10% that survives the probe. */
  val q84 = Q(
    "q84_bloom_prune",
    (s, dir) => {
      import s.implicits._
      val dim = Tables(s, dir, "part").filter($"p_size" <= 5)
      BloomPrune.semiJoin(Tables(s, dir, "lineitem"), dim,
          "l_partkey", "p_partkey", expectedItems = 100000L)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("revenue"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS revenue
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "X19: bloom semi-join pruning — MB-scale filter drops fact rows " +
      "pre-shuffle; exact semi-join scrubs false positives")

  /** q85 — heavy hitters via the Misra-Gries UDAF (X20): top suppliers
    * by lineitem count. Capacity 2048 ≥ the 1000 distinct suppliers at
    * sf0.1, so the sketch is in its exact regime and hash-matches the
    * plain group-count oracle; the lossy-regime guarantees are pinned by
    * HeavyHittersSpec. One pass, ≤ capacity counters per partition on
    * the wire — frequency estimation whose shuffle cost is independent
    * of row count. */
  val q85 = Q(
    "q85_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val hh = udaf(new graft.functions.HeavyHitters(2048))
      Tables(s, dir, "lineitem")
        .agg(hh($"l_suppkey").as("hits"))
        .select(explode($"hits").as("h"))
        .select($"h.key".as("l_suppkey"), $"h.est".as("cnt"))
        .orderBy($"cnt".desc, $"l_suppkey")
        .limit(10)
    },
    Some("""
      SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey
      ORDER BY cnt DESC, l_suppkey LIMIT 10"""),
    doc = "X20: mergeable Misra-Gries summary — exact below capacity " +
      "(oracle-checked), guaranteed-survival heavy hitters above it")

  /** q88 — keyed table diff (X23): orders vs a deterministically edited
    * version of itself (3 mod-classes of keys removed/changed/added).
    * TableDiff collapses each side to (key, fingerprint) before the
    * full-outer join, so the reconciliation of two wide tables shuffles
    * ~48 B/row; the oracle reproduces the statuses semantically (IS
    * DISTINCT FROM on the one edited column — equivalent outcomes,
    * since every other column is identical per key). */
  val q88 = Q(
    "q88_table_diff",
    (s, dir) => {
      import s.implicits._
      val left = Tables(s, dir, "orders")
      val edited = left.filter($"o_orderkey" % 97 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 89 === 1, $"o_totalprice" + lit(1.5))
            .otherwise($"o_totalprice"))
      val added = left.filter($"o_orderkey" % 101 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + lit(10000000L))
      TableDiff.summary(left, edited.unionByName(added), Seq("o_orderkey"))
    },
    Some("""
      WITH rb AS (SELECT o_orderkey,
                    CASE WHEN o_orderkey % 89 = 1 THEN o_totalprice + 1.5
                         ELSE o_totalprice END AS p
                  FROM orders WHERE o_orderkey % 97 <> 0),
      ra AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice AS p
             FROM orders WHERE o_orderkey % 101 = 0),
      r AS (SELECT * FROM rb UNION ALL SELECT * FROM ra),
      l AS (SELECT o_orderkey, o_totalprice AS p FROM orders),
      j AS (SELECT CASE WHEN l.o_orderkey IS NULL THEN 'added'
                        WHEN r.o_orderkey IS NULL THEN 'removed'
                        WHEN l.p IS DISTINCT FROM r.p THEN 'changed'
                        ELSE 'same' END AS status
            FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
      SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status"""),
    doc = "X23: fingerprint-compressed full-outer reconciliation — " +
      "added/removed/changed/same counts, payloads never shuffled")

  /** q103 — deterministic weighted sampling (X32): keep each document
    * with probability proportional to a quality weight (here
    * min(n_chars, 2000)/2000 — longer docs kept more often), the
    * importance-sampling step a training-data pipeline runs after
    * quality scoring. Acceptance is a PURE BIGINT comparison
    * (u·W < w·2²⁸ with u the md5-28-bit unit draw) — no float
    * round-trip anywhere, so the sample is bit-identical in any
    * engine, on any partitioning, on reprocessing. Same determinism
    * family as q67's split and q80's stratified rank. */
  val q103 = Q(
    "q103_weighted_sample",
    (s, dir) => {
      import s.implicits._
      val u = conv(substring(md5(concat(lit("ws:"), $"doc_id".cast(StringType))),
        1, 7), 16, 10).cast(LongType)
      Tables(s, dir, "documents")
        .select($"doc_id", $"n_chars", u.as("u"),
          least($"n_chars", lit(2000L)).as("wt"))
        .filter($"u" * 2000L < $"wt" * 268435456L)
        .select($"doc_id", $"n_chars", $"wt")
        .orderBy($"doc_id")
    },
    Some("""
      WITH k AS (SELECT doc_id, n_chars,
        CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) AS u,
        least(n_chars, 2000) AS wt
      FROM documents)
      SELECT doc_id, n_chars, wt FROM k
      WHERE u * 2000 < wt * 268435456 ORDER BY doc_id"""),
    doc = "X32: weighted sampling by quality weight — md5 unit draw, " +
      "integer-only acceptance test; deterministic and partitioning-invariant")

  /** q114 — recursive CTE chain walk (P8): WITH RECURSIVE landed in
    * Spark 4, completing the query surface for hierarchy/reachability
    * workloads (org charts, referral chains, BOM explosions) that
    * previously needed driver-side loops. The walk descends each
    * customer's order chain (capped at 10 hops — recursion depth is a
    * RESOURCE bound both engines enforce; the cap keeps it under
    * Spark's recursion limit at any scale factor) computing hop depth.
    * The SQL text is byte-identical in both engines (Q.sql), and
    * depth ≡ the window row_number by construction — the recursion is
    * cross-checked by a non-recursive invariant. */
  val q114 = {
    val sqlText = """
      WITH RECURSIVE base AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders WHERE o_custkey % 20 = 0),
      lim AS (SELECT * FROM base WHERE rn <= 10),
      nxt AS (SELECT o_orderkey AS cur,
                     lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY rn) AS nx
              FROM lim),
      walk(node, depth) AS (
        SELECT cur, CAST(1 AS BIGINT) FROM nxt
        WHERE cur NOT IN (SELECT nx FROM nxt WHERE nx IS NOT NULL)
        UNION ALL
        SELECT n.nx, w.depth + 1 FROM walk w JOIN nxt n ON n.cur = w.node
        WHERE n.nx IS NOT NULL)
      SELECT node AS o_orderkey, depth FROM walk ORDER BY o_orderkey"""
    Q.sql("q114_recursive_chain", sqlText, sqlText,
      doc = "P8: WITH RECURSIVE chain walk — byte-identical SQL both engines; " +
        "depth cross-checked by the row_number invariant")
  }

  /** q116 — LATERAL correlated subquery (P9): per-row top-k join ("each
    * customer's two most recent orders") — the query-surface form of
    * W5's top-k-per-group, which users coming from warehouse SQL write
    * as LATERAL rather than a window+filter. Catalyst decorrelates the
    * lateral into a ranked join (DecorrelateInnerQuery); SQL text is
    * byte-identical in both engines. */
  val q116 = {
    val sqlText = """
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) o
      WHERE c.c_custkey < 200
      ORDER BY c.c_custkey, o.o_orderkey"""
    Q.sql("q116_lateral_topk", sqlText, sqlText,
      doc = "P9: LATERAL correlated top-k — decorrelated by Catalyst; " +
        "byte-identical SQL both engines")
  }

  /** q140 — multi-probe IVF ANN (N13b): the [[graft.operators.IvfAnn]]
    * nProbe=2 path under the oracle gate. Every step is deterministic
    * exact-fold math (centroid ranking by exact L2 with ties to the
    * smaller id, candidate cosines as sequential folds), so unlike
    * real ANN libraries the approximate answer is reproducible enough
    * to hash-match a SQL twin — the oracle mirrors the probe set
    * (top-2 centroid cells per query) and re-derives identical top-3
    * neighbors. Recall floors for arbitrary nProbe live in IvfAnnSpec;
    * this query pins the operator's end-to-end plumbing cross-engine. */
  val q140 = Q(
    "q140_ivf_multiprobe",
    (s, dir) => {
      import s.implicits._
      import graft.operators.IvfAnn
      val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
      val assigned = IvfAnn.assign(emb, "vec_id", "embedding", cents)
      val queries = emb.filter($"vec_id" >= 8 && $"vec_id" < 12)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      IvfAnn.topK(assigned, "vec_id", "embedding", queries, cents,
          k = 3, nProbe = 2)
        .orderBy($"q_id", $"rn")
    },
    Some {
      val dA = s"(${VectorOps.dotSql("e.embedding", "e.embedding")} - 2 * ${VectorOps.dotSql("e.embedding", "c.c_vec")}) + ${VectorOps.dotSql("c.c_vec", "c.c_vec")}"
      val dQ = s"(${VectorOps.dotSql("q.q_vec", "q.q_vec")} - 2 * ${VectorOps.dotSql("q.q_vec", "c.c_vec")}) + ${VectorOps.dotSql("c.c_vec", "c.c_vec")}"
      s"""
      WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
      a AS (SELECT e.vec_id, e.embedding, c.c_id, $dA AS d2
            FROM embeddings e, cents c),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn FROM a),
      assign AS (SELECT vec_id, embedding, c_id FROM r WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
            WHERE vec_id >= 8 AND vec_id < 12),
      pr AS (SELECT q.q_id, q.q_vec, c.c_id, $dQ AS d2
             FROM q, cents c),
      probed AS (SELECT q_id, q_vec, c_id FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d2 ASC, c_id ASC) AS rn
          FROM pr) WHERE rn <= 2),
      cand AS (SELECT p.q_id, a.vec_id,
                 ${VectorOps.cosineSql("p.q_vec", "a.embedding")} AS cos
               FROM assign a JOIN probed p ON a.c_id = p.c_id AND a.vec_id <> p.q_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn FROM cand)
      SELECT q_id, rn, vec_id, cos FROM rr WHERE rn <= 3
      ORDER BY q_id, rn"""
    },
    doc = "N13b: multi-probe IVF under the oracle gate — deterministic " +
      "exact-fold math makes even the APPROXIMATE path hash-reproducible " +
      "cross-engine; tunable-recall operator is IvfAnn (spec-pinned floors)")

  val all: Seq[Q] =
    Seq(q65, q66, q67, q68, q69, q70, q71, q72, q73, q74, q75, q76, q77, q78,
      q79, q80, q81, q84, q85, q88, q103, q114, q116, q140)
}
