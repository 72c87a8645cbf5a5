package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables}
import graft.core.Barriers._

/** SURVEY.md §2.11a continued — scoring/selection operators that decide
  * WHICH rows enter a training mix or serving index: recency-decayed
  * engagement, rank-based surprisal quality, Neyman stratified
  * allocation, and grouped k-fold assignment. (A Pareto-skyline variant
  * was dropped here — X43/q125 already covers the operator class.)
  *
  * Determinism contract as Mining/Retrieval: exact BIGINT arithmetic
  * (integer DIV on non-negative operands — Spark DIV truncates toward
  * zero, DuckDB // floors; they agree only on non-negatives, which every
  * DIV below guarantees), md5-derived randomness, and shared textual
  * IEEE chains where a sqrt is irreducible.
  */
object Selection {

  /** q179's PrefixScan bucket over term strings — MUST be monotone
    * non-decreasing in UTF8-binary term order (PrefixScan's stated
    * precondition; Spark and DuckDB both sort strings by UTF-8 bytes,
    * and UTF-8 byte order equals codepoint order).
    *
    * Terms whose FIRST codepoint is < 255 bucket on
    * (cp1 · 256 + min(cp2, 255)) — max 254·256+255 = 65279; every term
    * whose first codepoint is ≥ 255 collapses into one bucket 65280
    * with NO second-codepoint component. The r6 form clamped BOTH
    * codepoints independently (min(cp1,255)·256 + min(cp2,255)), which
    * silently inverted order across distinct first codepoints ≥ U+00FF:
    * "Āz" (0x100,'z') → 65402 sorted BEFORE "Ła" (0x141,'a') → 65377 —
    * wrong ranks on any Latin-Extended/Cyrillic vocabulary (ADVICE r6;
    * SelectionSpec pins the monotonicity property on exactly that
    * counterexample). Collapsing the ≥255 tail costs only bucket
    * balance (those terms share one scan bucket), never correctness. */
  private[queries] val termBucket: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column = { term =>
    val cp1 = ascii(substring(term, 1, 1))
    val cp2 = ascii(substring(term, 2, 1))
    when(cp1 < 255, cp1 * 256 + least(cp2, lit(255))).otherwise(lit(65280))
  }

  /** The Neyman weight N_h·S_h micro-rounded — ONE textual chain over
    * exact BIGINT (nh, s1, s2); population variance (s2·n − s1²)/n²
    * under one correctly-rounded sqrt. Non-negative, so the two
    * engines' round modes agree. */
  private[queries] val neymanWMicroSql: String =
    """CAST(round(CAST(nh AS DOUBLE) * sqrt(
       (CAST(s2 AS DOUBLE) * CAST(nh AS DOUBLE) -
        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
       (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE))) *
       1000000) AS BIGINT)""".replaceAll("\\s+", " ")

  /** q178 — time-decayed engagement score: per user, Σ value·2⁻ᵏ with
    * k = age-in-weeks at the corpus' max timestamp. The textbook form
    * exp(−λ·age) needs libm exp (the q122 lesson); half-life decay
    * with a power-of-two base is the same signal and stays exact:
    * 2ᵏ is an exactly-representable double for k ≤ 62 (capped), so
    * micros(value) DIV 2ᵏ is pure BIGINT. Week ages come from
    * second-diffs (both engines floor to whole seconds identically).
    *
    * Scale: one narrow projection + one user-keyed aggregate; the
    * anchor is a 1-row broadcast. Decay-at-read beats decay-at-write
    * (no rewrite as the anchor advances).
    *
    * Precondition (ADVICE r5): events.value >= 0. The DIV-agreement
    * contract above holds only for non-negative operands — a negative
    * value would truncate toward zero in Spark but floor in DuckDB,
    * diverging by 1 micro per event. SelectionSpec asserts the fixture
    * domain; a caller with signed values must clamp or split sign
    * upstream. */
  val q178 = Q(
    "q178_time_decay",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val anchor = ev.agg(max(unix_timestamp($"ts")).as("anchor_s"))
      ev.select($"user_id", $"value", unix_timestamp($"ts").as("ts_s"))
        .crossJoin(broadcast(anchor))
        .withColumn("k", least(expr("(anchor_s - ts_s) DIV 604800"), lit(62L)))
        .withColumn("contrib",
          expr("""CAST(rint(value * 1000000.0) AS BIGINT)
                  DIV CAST(pow(2.0, k) AS BIGINT)"""))
        .groupBy($"user_id")
        .agg(sum($"contrib").as("score_micro"), count(lit(1)).as("n_events"))
        .orderBy($"score_micro".desc, $"user_id")
        .limit(50)
    },
    Some("""
      WITH anchor AS (SELECT MAX(ts) AS a FROM events),
      c AS (SELECT user_id,
              LEAST(date_diff('second', ts, a) // 604800, 62) AS k,
              CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
            FROM events CROSS JOIN anchor)
      SELECT user_id,
        CAST(SUM(vm // CAST(power(2.0, k) AS BIGINT)) AS BIGINT) AS score_micro,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM c GROUP BY 1 ORDER BY score_micro DESC, user_id LIMIT 50"""),
    doc = "half-life decayed engagement — 2^-k rational decay (no exp), " +
      "one user-keyed aggregate, broadcast anchor")

  /** q179 — rank-based surprisal quality score: a unigram-LM quality
    * proxy with NO log and NO float — each token's cost is its corpus
    * frequency RANK (dense_rank by count desc), a doc's score is its
    * mean token rank, plus the OOV fraction against the top-20
    * vocabulary. High mean rank = rare-heavy/degenerate text, the
    * cheap stand-in for LM perplexity filtering (Wenzek et al. '19
    * CCNet) when no model may be in the loop.
    *
    * Scale (r5 verdict item, implemented): terms are unique after the
    * vocab aggregate, so dense_rank(cnt desc, term) ≡ row_number, and
    * it decomposes into two [[graft.operators.PrefixScan]]s with NO
    * vocabulary-sized single-task window:
    *   (a) the strict-prefix term count comes from the count HISTOGRAM
    *       (groupBy cnt — value-domain-sized, O(√tokens) rows for a
    *       Zipf corpus, so the hapax tie-mass collapses to ONE weighted
    *       row instead of half the vocabulary in one sort task);
    *   (b) the within-count term position is a weight-1 scan grouped by
    *       cnt and bucketed by the term's 2-char prefix — the cnt=1
    *       group (half of any web-scale vocabulary) spreads over
    *       ~alphabet² tasks instead of one.
    *   rnk = (a) + (b), bit-identical to the window form.
    * The doc⋈rank join is deliberately UNHINTED: AQE's size-gated
    * auto-broadcast ships the rank table while it fits (every test SF)
    * and falls back to a shuffle equi-join when a 10⁹-term vocabulary
    * outgrows executor memory — the gate the old unconditional
    * broadcast() lacked. */
  val q179 = Q(
    "q179_rank_surprisal",
    (s, dir) => {
      import s.implicits._
      import graft.operators.PrefixScan
      val toks = Tables(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val vocab = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      val hist = vocab.groupBy($"cnt").agg(count(lit(1)).as("w"))
        .withColumn("negcnt", -$"cnt")
      val strictPrefix = PrefixScan.inclusive(hist, Nil, "negcnt", Nil,
          "w", v => -floor(log2(-v)), "cum_le")
        .select($"cnt", ($"cum_le" - $"w").as("base"))
      val within = PrefixScan.inclusive(
        vocab.withColumn("one", lit(1L)), Seq("cnt"), "term", Nil, "one",
        Selection.termBucket, "pos")
      val ranks = within.join(strictPrefix, "cnt")
        .select($"term", ($"base" + $"pos").as("rnk"))
      toks.join(ranks, "term")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"rnk").as("rank_sum"),
          sum(when($"rnk" > 20, 1L).otherwise(0L)).as("n_oov"))
        .select($"doc_id", $"n_tok",
          expr("(rank_sum * 1000000) DIV n_tok").as("mean_rank_ppm"),
          expr("(n_oov * 1000000) DIV n_tok").as("oov_ppm"))
        .orderBy($"mean_rank_ppm".desc, $"doc_id")
        .limit(20)
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
      v AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
      r AS (SELECT term, CAST(dense_rank() OVER (ORDER BY cnt DESC, term)
              AS BIGINT) AS rnk FROM v),
      d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
              CAST(SUM(rnk) AS BIGINT) AS rank_sum,
              CAST(SUM(CASE WHEN rnk > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
            FROM toks JOIN r USING (term) GROUP BY 1)
      SELECT doc_id, n_tok,
        CAST((rank_sum * 1000000) // n_tok AS BIGINT) AS mean_rank_ppm,
        CAST((n_oov * 1000000) // n_tok AS BIGINT) AS oov_ppm
      FROM d ORDER BY mean_rank_ppm DESC, doc_id LIMIT 20"""),
    doc = "rank surprisal + OOV quality gate — two-PrefixScan vocab rank " +
      "(histogram base + prefix-bucketed tiebreak), AQE size-gated " +
      "rank join, integer ppm scores")

  /** q180 — Neyman stratified allocation (Neyman 1934): split a budget
    * of k = 1000 sample slots across sources proportional to N_h·S_h
    * (stratum size × stddev of n_chars) — the variance-minimizing
    * allocation for a stratified mean estimate, i.e. "spend labeling
    * budget where the data varies". S_h needs one sqrt: the weight is
    * computed by ONE shared textual chain over exact BIGINT (N, Σx,
    * Σx²) then micro-rounded, so the BIGINT weight total is exact and
    * the largest-remainder finish (Hamilton apportionment) hits
    * EXACTLY k — fractional-share DIV + top-deficit +1 by (remainder
    * desc, source).
    *
    * Scale: everything after the one stratum-keyed aggregate runs on
    * a strata-sized frame (20 rows; the windows are harmless by
    * construction). */
  val q180 = Q(
    "q180_neyman_allocation",
    (s, dir) => {
      import s.implicits._
      val st = Tables(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("nh"), sum($"n_chars").as("s1"),
          sum($"n_chars" * $"n_chars").as("s2"))
        .withColumn("w_micro", expr(neymanWMicroSql))
      val tot = Window.partitionBy(lit(1))
      val ranked = st
        .withColumn("wtot", sum($"w_micro").over(tot))
        .withColumn("base", expr("(1000 * w_micro) DIV wtot"))
        .withColumn("rem", expr("(1000 * w_micro) % wtot"))
        .withColumn("deficit", lit(1000L) - sum($"base").over(tot))
        .withColumn("rn", row_number().over(
          Window.partitionBy(lit(1)).orderBy($"rem".desc, $"source"))
          .cast(LongType))
      ranked
        .select($"source", $"nh".as("n_docs"), $"w_micro",
          ($"base" + when($"rn" <= $"deficit", 1L).otherwise(0L)).as("alloc"))
        .orderBy($"source")
    },
    Some(s"""
      WITH st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
                    CAST(SUM(n_chars) AS BIGINT) AS s1,
                    CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
                  FROM documents GROUP BY 1),
      w AS (SELECT source, nh, $neymanWMicroSql AS w_micro FROM st),
      t AS (SELECT *, CAST(SUM(w_micro) OVER () AS BIGINT) AS wtot FROM w),
      b AS (SELECT *, (1000 * w_micro) // wtot AS base,
              (1000 * w_micro) % wtot AS rem FROM t),
      r AS (SELECT *, CAST(SUM(base) OVER () AS BIGINT) AS base_tot,
              CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
                AS rn
            FROM b)
      SELECT source, nh AS n_docs, w_micro,
        CAST(base + (CASE WHEN rn <= 1000 - base_tot THEN 1 ELSE 0 END)
          AS BIGINT) AS alloc
      FROM r ORDER BY source"""),
    doc = "Neyman allocation to exactly k=1000 — shared sqrt chain to " +
      "micro weights, Hamilton largest-remainder finish, 20-row frames")

  /** q181 — grouped k-fold assignment audit (GroupKFold): folds keyed
    * by the GROUP (customer), not the row, so no customer's orders
    * straddle train/test — the leakage row-level splits (N6/q67,
    * X69/q165) cannot prevent when rows of one entity correlate.
    * fold(c) = md5-bucket % 5 of the customer key alone; orders derive
    * their fold from o_custkey DIRECTLY — a pure function, so the
    * audit needs NO customer⋈orders join at any scale. Reports per
    * fold: customers, orders, revenue share.
    *
    * Scale: two independent aggregates (customer-keyed, order-keyed)
    * joined on the 5-row fold axis. */
  val q181 = Q(
    "q181_group_kfold",
    (s, dir) => {
      import s.implicits._
      def fold(key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit("gkf:"), key.cast(StringType))), 1, 15),
          16, 10).cast(LongType) % 5
      val cust = Tables(s, dir, "customer")
        .select(fold($"c_custkey").as("fold"))
        .groupBy($"fold").agg(count(lit(1)).as("n_customers"))
      val ord = Tables(s, dir, "orders")
        .select(fold($"o_custkey").as("fold"),
          expr("CAST(rint(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy($"fold")
        .agg(count(lit(1)).as("n_orders"), sum($"cents").as("rev_cents"))
      cust.join(ord, "fold")
        .withColumn("rev_share_ppm", expr(
          "(rev_cents * 1000000) DIV CAST(sum(rev_cents) OVER () AS BIGINT)"))
        .select($"fold", $"n_customers", $"n_orders", $"rev_cents",
          $"rev_share_ppm")
        .orderBy($"fold")
    },
    Some("""
      WITH cf AS (SELECT CAST(('0x' || substr(md5('gkf:' ||
                    CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS fold
                  FROM customer),
      cust AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_customers
               FROM cf GROUP BY 1),
      ofd AS (SELECT CAST(('0x' || substr(md5('gkf:' ||
                CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS fold,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
      ord AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(cents) AS BIGINT) AS rev_cents
              FROM ofd GROUP BY 1)
      SELECT fold, n_customers, n_orders, rev_cents,
        CAST((rev_cents * 1000000) //
          CAST(SUM(rev_cents) OVER () AS BIGINT) AS BIGINT) AS rev_share_ppm
      FROM cust JOIN ord USING (fold)
      ORDER BY fold"""),
    doc = "GroupKFold audit — fold is a pure function of the group key " +
      "(no join to assign), per-fold size/revenue shares")

  /** q197 — classifier-based quality filtering (N38): train the
    * log-free Naive-Bayes likelihood-ratio table against the lang='en'
    * reference class, score every document additively, emit
    * (doc_id, score, pred, actual). See
    * [[graft.operators.QualityClassifier]] — the GPT-3/CCNet selection
    * gate with the training loop collapsed to one aggregate pass so
    * the learned weights and every score hash-match the DuckDB twin.
    * (On this synthetic corpus the langs share one vocabulary, so the
    * learned signal is weak BY CONSTRUCTION — the oracle gates the
    * exact train+score algebra; QualitySpec pins perfect separation on
    * a fixture with real class signal.) */
  val q197 = Q(
    "q197_quality_classifier",
    (s, dir) => {
      import s.implicits._
      import graft.operators.QualityClassifier
      val docs = Tables(s, dir, "documents")
      val tok = QualityClassifier
        .tokenTable(docs, "doc_id", "text", $"lang" === "en")
        .persist()
      val w = QualityClassifier.trainWeights(tok)
      val out = QualityClassifier.score(tok, "doc_id", w)
        .join(docs.select($"doc_id", ($"lang" === "en").cast("int").as("actual")),
          "doc_id")
        .select($"doc_id", $"score",
          when($"score" > 0, 1).otherwise(0).as("pred"), $"actual")
        .orderBy($"doc_id")
        .barrier() // honors spark.graft.reliableCheckpoints (ADVICE r8)
      // ORDERING DEPENDENCY (ADVICE r9): the barrier above is EAGER —
      // `out` is fully materialized before this unpersist, so dropping
      // tok's cache here cannot force a recompute. If the barrier were
      // ever made lazy (eager = false), this line must move after the
      // first action on `out`.
      tok.unpersist()
      out
    },
    Some("""
      WITH tok AS (SELECT doc_id, lang = 'en' AS pos, t FROM (
             SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE len(t) > 0),
      cnt AS (SELECT t, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                        SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
              FROM tok GROUP BY t),
      tot AS (SELECT CAST(SUM(np) AS BIGINT) AS tnp,
                     CAST(SUM(nn) AS BIGINT) AS tnn,
                     CAST(COUNT(*) AS BIGINT) AS v FROM cnt),
      w AS (SELECT t,
              CAST((1000000 * (np + 1) * (tnn + v)) // ((nn + 1) * (tnp + v))
                AS BIGINT) - 1000000 AS wc
            FROM cnt, tot),
      sc AS (SELECT doc_id, CAST(SUM(wc) AS BIGINT) AS score
             FROM tok JOIN w USING (t) GROUP BY doc_id)
      SELECT d.doc_id, sc.score,
             CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS pred,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS actual
      FROM documents d JOIN sc ON d.doc_id = sc.doc_id
      ORDER BY d.doc_id"""),
    doc = "N38: classifier-based quality filter (GPT-3/CCNet gate) — log-free " +
      "NB likelihood-ratio weights in ppm, one-pass train, token-keyed score " +
      "join; exact BIGINT end to end")

  /** q207 — bigram-LM coherence scoring with stupid backoff (N43): the
    * perplexity-filter capability class (Wenzek '19 CCNet; Brants '07
    * stupid backoff) under this library's determinism contract — no
    * log, no float, no model file. A bigram LM is trained on the 80%
    * of documents with `doc_id % 5 != 0`; the held-out 20% are scored
    * by the ARITHMETIC mean of per-position conditional probabilities
    * in exact ppm (the geometric mean behind true perplexity needs a
    * log — q179's rank proxy covers that axis; the arithmetic mean
    * ranks fluency the same way and stays in BIGINT):
    *
    *   score(w1,w2) = 10⁶·c(w1,w2) DIV c(w1·)        if bigram seen
    *                = 0.4 · 10⁶·c(w2) DIV N           else if w2 seen
    *                = 0                                else (OOV)
    *
    * (0.4 is Brants' backoff penalty, exact as ·400000.) Per doc:
    * bigram count, mean score, backoff fraction and OOV fraction in
    * ppm — incoherent or out-of-domain text backs off constantly and
    * sinks; in-domain fluent text rides high bigram conditionals.
    * The held-out split is what makes backoff REAL: self-scoring a
    * corpus its own counts would never miss a bigram.
    *
    * Scale: two value-domain-sized count aggregates (bigram, head) +
    * one unigram aggregate over the train split; the scoring joins
    * are unhinted equi-joins on token keys (AQE broadcasts while the
    * LM fits, shuffles when a web-scale vocabulary doesn't — q179's
    * posture); N rides as a 1-row frame on a constant-key equi-join
    * (stream-legal, so [[graft.operators.BigramLm.score]] is the ONE
    * plan q207 and streaming T19 share — the E1==E2 guarantee).
    * Raw text never shuffles — only tokens, counts and ids. */
  val q207 = Q(
    "q207_bigram_coherence",
    (s, dir) => {
      import s.implicits._
      import graft.operators.BigramLm
      val d = Tables(s, dir, "documents")
      val lm = BigramLm.train(d.filter($"doc_id" % 5 =!= 0), "doc_id", "text")
      BigramLm.score(
          BigramLm.bigrams(d.filter($"doc_id" % 5 === 0), "doc_id", "text"),
          "doc_id", lm)
        .orderBy($"coherence_ppm".desc, $"doc_id")
        .limit(50)
    },
    Some("""
      WITH d AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
                 FROM documents),
      tb AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
             FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                   FROM d WHERE len(tk) >= 2)),
      trb AS (SELECT * FROM tb WHERE doc_id % 5 <> 0),
      bg AS (SELECT w1, w2, COUNT(*) AS cb FROM trb GROUP BY 1, 2),
      hd AS (SELECT w1, COUNT(*) AS ch FROM trb GROUP BY 1),
      tu AS (SELECT unnest(tk) AS w FROM d WHERE doc_id % 5 <> 0),
      uni AS (SELECT w, COUNT(*) AS cu FROM tu GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM tu),
      sc AS (SELECT h.doc_id,
               CASE WHEN bg.cb IS NOT NULL THEN (bg.cb * 1000000) // hd.ch
                    WHEN uni.cu IS NOT NULL THEN (uni.cu * 400000) // nn.n
                    ELSE 0 END AS score,
               bg.cb IS NULL AS backoff,
               (bg.cb IS NULL AND uni.cu IS NULL) AS oov
             FROM tb h
             LEFT JOIN bg ON h.w1 = bg.w1 AND h.w2 = bg.w2
             LEFT JOIN hd ON h.w1 = hd.w1
             LEFT JOIN uni ON h.w2 = uni.w
             CROSS JOIN nn
             WHERE h.doc_id % 5 = 0)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_big,
             CAST(SUM(score) // COUNT(*) AS BIGINT) AS coherence_ppm,
             CAST((SUM(CASE WHEN backoff THEN 1 ELSE 0 END) * 1000000)
               // COUNT(*) AS BIGINT) AS backoff_ppm,
             CAST((SUM(CASE WHEN oov THEN 1 ELSE 0 END) * 1000000)
               // COUNT(*) AS BIGINT) AS oov_ppm
      FROM sc GROUP BY doc_id ORDER BY coherence_ppm DESC, doc_id LIMIT 50"""),
    doc = "N43: bigram-LM coherence with stupid backoff — held-out split, " +
      "exact ppm conditionals, backoff/OOV accounting; the perplexity " +
      "filter class with no log and no float")

  /** q216 — quality-curriculum bin ranking (X96): curriculum learning
    * consumes TRAINING SEQUENCES in a quality order (clean-first is
    * the standard warm-up heuristic — Bengio '09 curriculum; the
    * practical spelling orders packed bins, because bins are what the
    * dataloader reads). Compose the q209 packing map with the q197
    * classifier scores: each bin's quality is its token-weighted score
    * mass (Σ doc_score·seg_len — exact BIGINT; NO per-doc division,
    * whose truncation direction Spark and DuckDB disagree on for the
    * negative scores half the corpus has), ranked by the score-mass /
    * fill ratio. The ONE float is that ratio, a single BIGINT→DOUBLE
    * divide — exact cast + correctly-rounded IEEE division, so both
    * engines order identically (the q94 shared-chain principle,
    * degenerate case); every OUTPUT column stays integer.
    *
    * Overflow bound: |score(doc)| ≤ 10⁶·n_tok(doc) (per-token weights
    * are ppm-scaled likelihood ratios), so |score·seg_len| ≤
    * 10⁶·n_tok·L and a bin's |score_mass| ≤ 10⁶·L·Σ n_tok over its
    * ≤ L member-doc slices ≤ 10⁶·L²·max_n_tok — with L = 128 that
    * stays under 2⁶³ for documents up to ~3.4·10⁹ tokens, far beyond
    * any real document. The DOUBLE cast is exact below 2⁵³, i.e. for
    * bins whose |score_mass| stays under ~9·10¹⁵ (max_n_tok ≲ 5·10⁵);
    * beyond that the ratio rounds but both engines round IDENTICALLY
    * (same cast, same divide), so the ordering still hash-matches.
    *
    * Scale: the packing map and score join are q209/q197's posture;
    * the curriculum head is `orderBy.limit` — TakeOrdered, never a
    * global sort — and the rank window runs over the 100-row result,
    * bounded at any corpus size. */
  val q216 = Q(
    "q216_curriculum_bins",
    (s, dir) => {
      import s.implicits._
      import graft.operators.QualityClassifier
      val docs = Tables(s, dir, "documents")
      val tok = QualityClassifier
        .tokenTable(docs, "doc_id", "text", $"lang" === "en")
        .persist()
      val sc = QualityClassifier
        .score(tok, "doc_id", QualityClassifier.trainWeights(tok))
      val bins = Text.packingMap(docs, L = 128)
        .join(sc, "doc_id")
        .groupBy($"bin_id")
        .agg(sum($"seg_len").as("fill"),
          sum($"score" * $"seg_len").as("score_mass"))
        .withColumn("ratio",
          $"score_mass".cast("double") / $"fill".cast("double"))
      val top = bins.orderBy($"ratio".desc, $"bin_id").limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy($"ratio".desc, $"bin_id")))
        .select($"rank", $"bin_id", $"fill", $"score_mass")
        .orderBy($"rank")
        .barrier() // honors spark.graft.reliableCheckpoints
      // ORDERING DEPENDENCY (ADVICE r9): the eager barrier above has
      // already materialized `top`; unpersisting tok afterwards is safe
      // ONLY because of that ordering. A lazy barrier here would drop
      // the cache before first use and recompute tok's lineage twice.
      tok.unpersist()
      top
    },
    Some("""
      WITH tok AS (SELECT doc_id, lang = 'en' AS pos, t FROM (
             SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE len(t) > 0),
      cnt AS (SELECT t, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
                        SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
              FROM tok GROUP BY t),
      tot AS (SELECT CAST(SUM(np) AS BIGINT) AS tnp,
                     CAST(SUM(nn) AS BIGINT) AS tnn,
                     CAST(COUNT(*) AS BIGINT) AS v FROM cnt),
      w AS (SELECT t,
              CAST((1000000 * (np + 1) * (tnn + v)) // ((nn + 1) * (tnp + v))
                AS BIGINT) - 1000000 AS wc
            FROM cnt, tot),
      sc AS (SELECT doc_id, CAST(SUM(wc) AS BIGINT) AS score
             FROM tok JOIN w USING (t) GROUP BY doc_id),
      d AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '),
                t -> len(t) > 0)) AS BIGINT) AS n_tok
            FROM documents),
      c AS (SELECT doc_id, n_tok,
              CAST(SUM(n_tok) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM d WHERE n_tok > 0),
      e AS (SELECT doc_id, cum, cum - n_tok AS st,
              (cum - n_tok) // 128 AS b0, (cum - 1) // 128 AS b1
            FROM c),
      x AS (SELECT doc_id, bin_id,
              CAST(LEAST(cum, (bin_id + 1) * 128)
                - GREATEST(st, bin_id * 128) AS BIGINT) AS seg_len
            FROM (SELECT doc_id, st, cum,
                    unnest(range(b0, b1 + 1)) AS bin_id FROM e)),
      bins AS (SELECT x.bin_id, CAST(SUM(x.seg_len) AS BIGINT) AS fill,
                 CAST(SUM(sc.score * x.seg_len) AS BIGINT) AS score_mass
               FROM x JOIN sc USING (doc_id) GROUP BY x.bin_id),
      rk AS (SELECT *, row_number() OVER (ORDER BY
               CAST(score_mass AS DOUBLE) / CAST(fill AS DOUBLE) DESC,
               bin_id) AS rank
             FROM bins)
      SELECT CAST(rank AS INT) AS rank, CAST(bin_id AS BIGINT) AS bin_id,
             fill, score_mass
      FROM rk WHERE rank <= 100 ORDER BY rank"""),
    doc = "X96: quality-curriculum bin ranking — q209 packing ⋈ q197 " +
      "classifier scores, exact BIGINT score mass (no negative division), " +
      "one IEEE divide for ordering, TakeOrdered head + 100-row rank window")

  val all: Seq[Q] = Seq(q178, q179, q180, q181, q197, q207, q216)
}
