package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables}

/** SURVEY.md §2.11a continued — statistical-inference operators over
  * the event stream and corpus: Markov removal-effect attribution,
  * inter-rater agreement (Cohen's κ), and the Poisson bootstrap.
  * These close the "how sure are we" gap of the audit family: q158's
  * z-test and q160's KS test assume a model; the bootstrap and κ are
  * the assumption-free companions, and removal-effect attribution is
  * the causal reading of q104's transition matrix.
  *
  * Determinism: the registry contract — exact BIGINT arithmetic,
  * md5-derived randomness with EMBEDDED integer thresholds, driver-side
  * iteration only on collected reduced statistics (the q175 device)
  * mirrored by DuckDB recursive CTEs.
  */
object Inference {

  /** κ micro — ONE textual IEEE chain over exact BIGINT cells.
    * pₒ = (c11+c00)/n, pₑ = (rowA₁·colB₁ + rowA₀·colB₀)/n².
    * Degenerate-rater guard (ADVICE r5): pₑ = 1 (both raters constant,
    * e.g. every document on the same side of both gates) makes the
    * denominator 0 — Spark would CAST the NaN to 0 while DuckDB errors
    * on the cast, a silent cross-engine divergence. pₑ = 1 is an
    * INTEGER-exact condition (rowA₁·colB₁ + rowA₀·colB₀ = n²), so both
    * engines gate it identically and return NULL as the κ-undefined
    * sentinel. */
  private[queries] val kappaMicroSql: String =
    """CASE WHEN (c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00) = n * n
       THEN CAST(NULL AS BIGINT) ELSE CAST(round((
       (CAST(c11 + c00 AS DOUBLE) / CAST(n AS DOUBLE)) -
       (CAST(c11 + c10 AS DOUBLE) * CAST(c11 + c01 AS DOUBLE) +
        CAST(c01 + c00 AS DOUBLE) * CAST(c10 + c00 AS DOUBLE)) /
       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / (1.0 -
       (CAST(c11 + c10 AS DOUBLE) * CAST(c11 + c01 AS DOUBLE) +
        CAST(c01 + c00 AS DOUBLE) * CAST(c10 + c00 AS DOUBLE)) /
       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1000000)
       AS BIGINT) END""".replaceAll("\\s+", " ")

  /** Poisson(1) sampling weight from a 31-bit uniform — inverse CDF
    * with embedded thresholds ⌊2³¹·F(k)⌋ for k = 0..7 (tail mass
    * beyond 7 is < 2⁻²¹; mapped to 8). Identical literals in both
    * engines; no runtime exp/factorial. */
  private[queries] val poissonWSql: String =
    """CASE WHEN u31 < 790015084 THEN 0 WHEN u31 < 1580030168 THEN 1
       WHEN u31 < 1975037710 THEN 2 WHEN u31 < 2106706891 THEN 3
       WHEN u31 < 2139624186 THEN 4 WHEN u31 < 2146207645 THEN 5
       WHEN u31 < 2147304888 THEN 6 WHEN u31 < 2147461638 THEN 7
       ELSE 8 END""".replaceAll("\\s+", " ")

  /** q183 — Markov removal-effect attribution (Anderl et al. 2016,
    * the standard data-driven attribution model): journeys = per-user
    * event sequences cut at first purchase; absorbing-chain conversion
    * probability from START, re-solved with each channel's inbound
    * transitions removed; a channel's credit is the conversion it
    * carries. Solved by 50 FIXED iterations of v ← Av + b (the q175
    * fixed-iteration device — bit-deterministic whether or not
    * converged) on the COLLECTED transition matrix (≤ 6×6 cells — a
    * reduced statistic); the DuckDB twin iterates a variant-keyed
    * recursive CTE, one vector per removed channel.
    *
    * Scale: the corpus pass is q104's shape — one user-keyed window
    * (row_number/lag/lead share the exchange) + a (from,to) aggregate;
    * everything after runs on ≤ 30 cells. */
  val q183 = Q(
    "q183_markov_attribution",
    (s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ev = Tables(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("seq", row_number().over(wOrd))
      val cut = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id").agg(min($"seq").as("cutseq"))
      val j = ev.join(cut, Seq("user_id"), "left")
        .filter($"cutseq".isNull || $"seq" <= $"cutseq")
      val w2 = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val steps = j
        .select(coalesce(lag($"event_type", 1).over(w2), lit("__start")).as("f"),
          $"event_type".as("t"))
      val drops = j
        .withColumn("nxt", lead($"event_type", 1).over(w2))
        .filter($"nxt".isNull && $"event_type" =!= "purchase")
        .select($"event_type".as("f"), lit("__drop").as("t"))
      val counts = steps.union(drops).groupBy($"f", $"t")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val states = Seq("__start", "click", "error", "signup", "view")
      // Loud domain guard (ADVICE r5): the state list is hard-coded in
      // BOTH engines (the DuckDB twin embeds the same literals), so an
      // unexpected event_type would be silently dropped from the
      // transition matrix on both sides — masking exactly the
      // divergence the oracle exists to catch. Fail instead (the
      // MergeInto loud-failure precedent).
      val observed = counts.keysIterator
        .flatMap { case (f, t) => Iterator(f, t) }
        .filterNot(Set("__start", "__drop", "purchase")).toSet
      require(observed.subsetOf(states.drop(1).toSet),
        s"q183: event_type domain grew beyond the hard-coded channel list: " +
          s"unexpected ${observed -- states.drop(1).toSet} — extend the state " +
          "list in BOTH the Spark build and the DuckDB twin")
      val d = states.length
      val totals = states.map(f =>
        counts.collect { case ((`f`, _), n) => n }.sum.toDouble)
      def p(f: Int, t: String): Double = {
        val tot = totals(f)
        if (tot == 0) 0.0
        else counts.getOrElse((states(f), t), 0L).toDouble / tot
      }
      val bVec = Array.tabulate(d)(i => p(i, "purchase"))
      def solve(removed: String): Double = {
        val a = Array.tabulate(d, d)((i, jj) =>
          if (states(jj) == removed) 0.0 else p(i, states(jj)))
        var v = Array.fill(d)(0.0)
        for (_ <- 0 until 50) {
          v = Array.tabulate(d) { i =>
            var acc = 0.0; var jj = 0
            while (jj < d) { acc += a(i)(jj) * v(jj); jj += 1 }
            acc + bVec(i)
          }
        }
        v(0)
      }
      def awayMicro(x: Double): Long = {
        val y = x * 1000000.0
        (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
      }
      val baseM = awayMicro(solve("__none"))
      // A corpus with zero purchases has no conversion to attribute:
      // removal_effect_ppm divides by baseM — fail loudly, not by zero.
      require(baseM > 0L,
        "q183: no purchase conversions in the corpus — removal-effect " +
          "attribution is undefined (division by base conversion 0)")
      val rows = states.drop(1).map { ch =>
        val remM = awayMicro(solve(ch))
        (ch, baseM, remM, (baseM - remM) * 1000000L / baseM)
      }
      s.createDataFrame(rows)
        .toDF("channel", "base_conv_micro", "removed_conv_micro",
          "removal_effect_ppm")
        .orderBy($"channel")
    },
    Some("""
      WITH RECURSIVE
      ev AS (SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS seq
             FROM events),
      cut AS (SELECT user_id, MIN(seq) AS cutseq FROM ev
              WHERE event_type = 'purchase' GROUP BY 1),
      j AS (SELECT ev.* FROM ev LEFT JOIN cut USING (user_id)
            WHERE cut.cutseq IS NULL OR ev.seq <= cut.cutseq),
      tr AS (SELECT COALESCE(lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id), '__start') AS f,
               event_type AS t
             FROM j
             UNION ALL
             SELECT event_type, '__drop'
             FROM (SELECT *, lead(event_type) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                   FROM j) z
             WHERE nxt IS NULL AND event_type <> 'purchase'),
      c AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
      tot AS (SELECT f, CAST(SUM(n) AS BIGINT) AS dn FROM c GROUP BY 1),
      probs AS (SELECT c.f, c.t, CAST(c.n AS DOUBLE) / CAST(tot.dn AS DOUBLE)
                  AS p
                FROM c JOIN tot USING (f)),
      sts AS (SELECT ['__start', 'click', 'error', 'signup', 'view'] AS s),
      vars AS (SELECT unnest(['__none', 'click', 'error', 'signup', 'view'])
                 AS ch),
      acell AS (SELECT v.ch, r1.i, r2.j,
                  CASE WHEN (SELECT s FROM sts)[CAST(r2.j AS INT)] = v.ch
                    THEN CAST(0.0 AS DOUBLE)
                    ELSE COALESCE((SELECT p FROM probs
                      WHERE f = (SELECT s FROM sts)[CAST(r1.i AS INT)]
                        AND t = (SELECT s FROM sts)[CAST(r2.j AS INT)]),
                      CAST(0.0 AS DOUBLE)) END AS a
                FROM vars v, range(1, 6) r1(i), range(1, 6) r2(j)),
      arow AS (SELECT ch, i, list(a ORDER BY j) AS rw FROM acell GROUP BY 1, 2),
      amat AS (SELECT ch, list(rw ORDER BY i) AS am FROM arow GROUP BY 1),
      bcell AS (SELECT r1.i,
                  COALESCE((SELECT p FROM probs
                    WHERE f = (SELECT s FROM sts)[CAST(r1.i AS INT)]
                      AND t = 'purchase'), CAST(0.0 AS DOUBLE)) AS bb
                FROM range(1, 6) r1(i)),
      bvec AS (SELECT list(bb ORDER BY i) AS bv FROM bcell),
      it(ch, k, v) AS (
        SELECT ch, 0, list_transform(range(1, 6), x -> CAST(0.0 AS DOUBLE))
        FROM amat
        UNION ALL
        SELECT it.ch, k + 1, list_transform(range(1, 6), i ->
          list_reduce(list_transform(range(1, 6), j ->
            am[CAST(i AS INT)][CAST(j AS INT)] * v[CAST(j AS INT)]),
            (a, b) -> a + b) + bv[CAST(i AS INT)])
        FROM it JOIN amat ON it.ch = amat.ch CROSS JOIN bvec
        WHERE k < 50),
      fin AS (SELECT ch, CAST(round(v[1] * 1000000) AS BIGINT) AS m
              FROM it WHERE k = 50),
      base AS (SELECT m AS bm FROM fin WHERE ch = '__none')
      SELECT ch AS channel, bm AS base_conv_micro, m AS removed_conv_micro,
        CAST(((bm - m) * 1000000) // bm AS BIGINT) AS removal_effect_ppm
      FROM fin CROSS JOIN base WHERE ch <> '__none'
      ORDER BY channel"""),
    doc = "Markov removal-effect attribution — q104-shaped corpus pass, " +
      "50 fixed affine iterations per removed channel on collected cells, " +
      "variant-keyed recursive-CTE twin")

  /** q184 — inter-rater agreement, Cohen's κ (Cohen 1960): agreement
    * between two deterministic labeling rules (char-length gate vs
    * token-count gate over documents) corrected for chance. κ =
    * (pₒ−pₑ)/(1−pₑ) from four exact BIGINT contingency cells via one
    * shared IEEE chain (κ can be negative — round modes still agree,
    * both away-from-zero). The operator shape is what matters: any
    * two label columns (human annotators, model versions) slot in.
    *
    * Scale: one corpus aggregate to 4 cells. */
  val q184 = Q(
    "q184_cohens_kappa",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(
          when($"n_chars" >= 200, 1L).otherwise(0L).as("ra"),
          when(size(split($"text", " ")) >= 40, 1L).otherwise(0L).as("rb"))
        .agg(count(lit(1)).as("n"),
          sum(when($"ra" === 1 && $"rb" === 1, 1L).otherwise(0L)).as("c11"),
          sum(when($"ra" === 1 && $"rb" === 0, 1L).otherwise(0L)).as("c10"),
          sum(when($"ra" === 0 && $"rb" === 1, 1L).otherwise(0L)).as("c01"),
          sum(when($"ra" === 0 && $"rb" === 0, 1L).otherwise(0L)).as("c00"))
        .select($"n", $"c11", $"c10", $"c01", $"c00",
          expr("((c11 + c00) * 1000000) DIV n").as("po_ppm"),
          expr(kappaMicroSql).as("kappa_micro"))
    },
    Some(s"""
      WITH r AS (SELECT
          CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS ra,
          CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END AS rb
        FROM documents),
      c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS c11,
          CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS c10,
          CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS c01,
          CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS c00
        FROM r)
      SELECT n, c11, c10, c01, c00,
        CAST(((c11 + c00) * 1000000) // n AS BIGINT) AS po_ppm,
        $kappaMicroSql AS kappa_micro
      FROM c"""),
    doc = "Cohen's kappa between two deterministic raters — 4 exact cells, " +
      "chance-corrected agreement, 1 row out")

  /** q185 — Poisson bootstrap CI (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams"): the bootstrap that works
    * at 100 TB — no resampling pass per replicate; each row carries
    * B=100 independent Poisson(1) weights and every replicate mean is
    * a weighted aggregate computed in ONE corpus pass. Weights are
    * md5-derived via the EMBEDDED inverse-CDF thresholds (⌊2³¹·F(k)⌋
    * literals, identical in both engines — no runtime exp), means are
    * integer micro ratios, and the CI reads exact order statistics
    * (nearest-rank P05/P95) off the 100-row replicate frame.
    *
    * Scale: B·N expanded rows but map-side partial aggregation
    * collapses to B keys before the only shuffle; the replicate frame
    * is 100 rows by construction. */
  val q185 = Q(
    "q185_poisson_bootstrap",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id", $"n_chars")
      val reps = docs
        .select($"doc_id", $"n_chars",
          explode(sequence(lit(1), lit(100))).as("r"))
        .withColumn("u31",
          conv(substring(md5(concat(lit("pb:"), $"r".cast(StringType),
            lit(":"), $"doc_id".cast(StringType))), 1, 15), 16, 10)
            .cast(LongType) % 2147483648L)
        .withColumn("w", expr(poissonWSql))
        .groupBy($"r")
        .agg(sum($"w" * $"n_chars").as("wx"), sum($"w").as("wn"))
        .select($"r", expr("(wx * 1000000) DIV wn").as("mean_micro"))
      val ranked = reps.withColumn("rn", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"mean_micro", $"r")).cast(LongType))
      val full = docs.agg(count(lit(1)).as("n_docs"),
        expr("(sum(n_chars) * 1000000) DIV count(1)").as("mean_micro"))
      full.crossJoin(
          ranked.filter($"rn" === 5).select($"mean_micro".as("ci_lo_micro")))
        .crossJoin(
          ranked.filter($"rn" === 95).select($"mean_micro".as("ci_hi_micro")))
        .select($"n_docs", $"mean_micro", $"ci_lo_micro", $"ci_hi_micro")
    },
    Some(s"""
      WITH reps AS (SELECT r.r, doc_id, n_chars,
              CAST(('0x' || substr(md5('pb:' || CAST(r.r AS VARCHAR) || ':' ||
                CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2147483648 AS u31
            FROM documents, range(1, 101) r(r)),
      wts AS (SELECT r, doc_id, n_chars, $poissonWSql AS w FROM reps),
      mns AS (SELECT r, CAST((SUM(w * n_chars) * 1000000) // SUM(w) AS BIGINT)
                AS mean_micro
              FROM wts GROUP BY 1),
      rk AS (SELECT mean_micro, CAST(row_number() OVER
               (ORDER BY mean_micro, r) AS BIGINT) AS rn FROM mns),
      f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST((SUM(n_chars) * 1000000) // COUNT(*) AS BIGINT) AS mean_micro
            FROM documents)
      SELECT f.n_docs, f.mean_micro,
        lo.mean_micro AS ci_lo_micro, hi.mean_micro AS ci_hi_micro
      FROM f, (SELECT mean_micro FROM rk WHERE rn = 5) lo,
              (SELECT mean_micro FROM rk WHERE rn = 95) hi"""),
    doc = "Poisson bootstrap P05-P95 CI — B=100 weights per row in one pass, " +
      "embedded inverse-CDF thresholds, exact order-statistic CI")

  val all: Seq[Q] = Seq(q183, q184, q185)
}
