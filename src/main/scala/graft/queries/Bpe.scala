package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.operators.BpeVocab

/** SURVEY.md §2.11a N37 — BPE tokenizer training over the documents
  * corpus, the vocabulary-induction step of an LLM data pipeline
  * (Sennrich '16). See [[graft.operators.BpeVocab]] for the scale
  * shape (one corpus pass, then rounds over the distinct-word table)
  * and the fixed-width-hashed-symbol device that makes the iterative
  * merge loop hash-match a DuckDB twin exactly.
  */
object Bpe {

  private val Rounds = 6

  /** chr(31) = U+001F, [[BpeVocab.Sep]]. */
  private val sepSql = "chr(31)"

  /** Initial word table CTE: (w, freq, repr). */
  private val wordCtes: String = s"""wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      w0 AS (SELECT w, freq,
               array_to_string(list_transform(range(1, len(w) + 1),
                 i -> $sepSql || substr(md5(substr(w, CAST(i AS INT), 1)), 1, 8)),
                 '') AS repr
             FROM wf)"""

  /** One merge round r: pair counts from w{r-1}, argmax pair t{r}
    * (count DESC, a, b — BpeVocab's tie-break), merged table w{r}. */
  private def roundCtes(r: Int): String = s"""
      s$r AS (SELECT freq, list_filter(string_split(repr, $sepSql),
                       x -> x <> '') AS sy
              FROM w${r - 1} WHERE len(repr) >= 18),
      p$r AS (SELECT a, b, SUM(freq) AS cnt FROM (
                SELECT freq,
                       unnest(list_slice(sy, 1, len(sy) - 1)) AS a,
                       unnest(list_slice(sy, 2, len(sy))) AS b
                FROM s$r WHERE len(sy) >= 2)
              GROUP BY a, b),
      t$r AS (SELECT a, b, substr(md5(a || b), 1, 8) AS m, CAST(cnt AS BIGINT) AS cnt
              FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
      w$r AS MATERIALIZED (SELECT w, freq,
                replace(repr, $sepSql || a || $sepSql || b, $sepSql || m) AS repr
              FROM w${r - 1} CROSS JOIN t$r)"""

  private val trainCtes: String =
    wordCtes + (1 to Rounds).map(roundCtes).mkString(",", ",", "")

  /** q194 — BPE vocabulary induction (N37): 6 merge rounds over the
    * corpus word-frequency table; output = the learned merge table
    * (round, pair, merged id, support). The oracle replays the exact
    * same greedy algebra as chained CTEs — iterative tokenizer
    * training made hash-reproducible. */
  val q194 = Q(
    "q194_bpe_train",
    (s, dir) => {
      import s.implicits._
      val words = BpeVocab.wordTable(Tables(s, dir, "documents"), "text")
      val (merges, _) = BpeVocab.train(words, Rounds)
      BpeVocab.mergesDf(s, merges).orderBy($"round")
    },
    Some(s"""
      WITH $trainCtes
      ${(1 to Rounds).map(r =>
        s"SELECT $r AS round, a, b, m AS merged, cnt FROM t$r")
        .mkString("\n      UNION ALL ")}
      ORDER BY round"""),
    doc = "N37: distributed BPE training (Sennrich '16) — one corpus pass to " +
      "the word-freq table, then per-round map-combined pair counts + a " +
      "1-row argmax collect + a zero-shuffle merge projection")

  /** q195 — BPE segmentation audit (N37b): apply the learned vocabulary
    * back to the corpus; per document, token count and post-merge
    * symbol count (the compression the 6 merges bought). The corpus
    * joins the final word table on the word key — a plain shuffle
    * equi-join; the word table is Heaps'-law-sized, never corpus-sized. */
  val q195 = Q(
    "q195_bpe_encode",
    (s, dir) => {
      import s.implicits._
      val words = BpeVocab.wordTable(Tables(s, dir, "documents"), "text")
      val (_, finalWords) = BpeVocab.train(words, Rounds)
      val vocab = finalWords
        .select($"w", size(BpeVocab.syms($"repr")).as("ns"))
      Tables(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(vocab, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"ns").as("n_sym"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $trainCtes,
      vocab AS (SELECT w, len(list_filter(string_split(repr, $sepSql),
                          x -> x <> '')) AS ns
                FROM w$Rounds),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(v.ns) AS BIGINT) AS n_sym
      FROM toks t JOIN vocab v ON t.w = v.w
      WHERE len(t.w) > 0
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    doc = "N37b: tokenize-with-learned-vocab — corpus ⋈ word-table on the word " +
      "key; per-doc compression audit of the trained merges")

  /** q214 — pack the BPE-tokenized corpus (X94): q209 packs by
    * whitespace tokens, but training sequences are measured in
    * TOKENIZER tokens — whitespace counts misplace every bin boundary
    * the moment a tokenizer splits rare words (exactly what BPE with a
    * small merge budget does). This is the production composition:
    * the q194-trained vocabulary's per-word symbol counts (q195's
    * audit frame) feed [[Text.packingMapFromCounts]], so bin
    * boundaries land on REAL token arithmetic. Composition-grade
    * oracle (q210's thesis): a drift between the encoder's counts and
    * the packer's counts silently shifts every downstream bin id —
    * only the end-to-end hash catches it.
    *
    * Scale: q194/q195's posture (one corpus pass + Heaps'-law word
    * table rounds + word-key equi-join) feeding q209's (empty-group
    * PrefixScan, bounded explode). Nothing new shuffles. */
  val q214 = Q(
    "q214_bpe_packing",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val words = BpeVocab.wordTable(docs, "text")
      val (_, finalWords) = BpeVocab.train(words, Rounds)
      val vocab = finalWords
        .select($"w", size(BpeVocab.syms($"repr")).as("ns"))
      val counts = docs
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(vocab, "w")
        .groupBy($"doc_id")
        .agg(sum($"ns").cast("long").as("n_tok"))
      Text.packingMapFromCounts(counts, L = 128)
        .orderBy($"doc_id", $"bin_id")
    },
    Some(s"""
      WITH $trainCtes,
      vocab AS (SELECT w, len(list_filter(string_split(repr, $sepSql),
                          x -> x <> '')) AS ns
                FROM w$Rounds),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
      d AS (SELECT t.doc_id, CAST(SUM(v.ns) AS BIGINT) AS n_tok
            FROM toks t JOIN vocab v ON t.w = v.w
            WHERE len(t.w) > 0 GROUP BY t.doc_id),
      cum AS (SELECT doc_id, n_tok,
                CAST(SUM(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
              FROM d WHERE n_tok > 0),
      e AS (SELECT doc_id, cum, cum - n_tok AS st,
              (cum - n_tok) // 128 AS b0, (cum - 1) // 128 AS b1
            FROM cum),
      x AS (SELECT doc_id, st, cum, b0, b1, unnest(range(b0, b1 + 1)) AS bin_id
            FROM e)
      SELECT doc_id, CAST(bin_id AS BIGINT) AS bin_id,
             CAST(GREATEST(st, bin_id * 128) - bin_id * 128 AS BIGINT) AS bin_off,
             CAST(GREATEST(st, bin_id * 128) - st AS BIGINT) AS doc_off,
             CAST(LEAST(cum, (bin_id + 1) * 128)
               - GREATEST(st, bin_id * 128) AS BIGINT) AS seg_len,
             CAST(b1 > b0 AS INT) AS split
      FROM x ORDER BY doc_id, bin_id"""),
    doc = "X94: pack by REAL tokenizer counts — q194's trained BPE vocab → " +
      "per-doc symbol counts → q209's packing math; bin boundaries on " +
      "token arithmetic, end-to-end hash-checked composition")

  // ---- WordPiece (N46/N46b/X99 — the second tokenizer family) ----

  private val WpRounds = 6

  /** One WordPiece merge round r over w{r-1}: symbol states ws$r,
    * unigram counts wu$r, pair counts wp$r, the LIKELIHOOD argmax wt$r
    * (`cnt/(ca·cb)` — one IEEE multiply + divide of exact BIGINT
    * casts, bit-identical cross-engine; ties (a, b) asc), the merged
    * table w$r, and the spelling table sp$r (each merged id resolves
    * to the concatenation of its parents' spellings — what greedy
    * longest-match consumes). */
  private def wpRoundCtes(r: Int, marked: Boolean = false): String = s"""
      ws$r AS MATERIALIZED (SELECT freq, list_filter(string_split(repr, $sepSql),
                        x -> x <> '') AS sy
               FROM w${r - 1}),
      wu$r AS MATERIALIZED (SELECT sym, CAST(SUM(freq) AS BIGINT) AS c FROM (
                 SELECT freq, unnest(sy) AS sym FROM ws$r)
               GROUP BY sym),
      wp$r AS MATERIALIZED (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
                 SELECT freq,
                        unnest(list_slice(sy, 1, len(sy) - 1)) AS a,
                        unnest(list_slice(sy, 2, len(sy))) AS b
                 FROM ws$r WHERE len(sy) >= 2)
               GROUP BY a, b),
      wt$r AS MATERIALIZED (SELECT a, b, substr(md5(a || b), 1, 8) AS m, cnt,
                      ua.c AS ca, ub.c AS cb
               FROM wp$r JOIN wu$r ua ON ua.sym = a
                         JOIN wu$r ub ON ub.sym = b
               ORDER BY CAST(cnt AS DOUBLE)
                        / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) DESC,
                        a, b
               LIMIT 1),
      w$r AS MATERIALIZED (SELECT w, freq,
                replace(repr, $sepSql || a || $sepSql || b, $sepSql || m) AS repr
              FROM w${r - 1} CROSS JOIN wt$r),
      sp$r AS MATERIALIZED (SELECT id, spell${if (marked) ", cont" else ""} FROM sp${r - 1}
               UNION ALL
               SELECT wt$r.m AS id, spa.spell || spb.spell AS spell${
                 if (marked) ", spa.cont AS cont" else ""}
               FROM wt$r JOIN sp${r - 1} spa ON spa.id = wt$r.a
                         JOIN sp${r - 1} spb ON spb.id = wt$r.b)"""

  /** WordPiece training chain: the shared word table + char spellings
    * sp0, then [[WpRounds]] scored rounds. */
  private val wpTrainCtes: String =
    wordCtes + s""",
      wch AS MATERIALIZED (SELECT DISTINCT unnest(list_transform(range(1, len(w) + 1),
                i -> substr(w, CAST(i AS INT), 1))) AS c
              FROM wf),
      sp0 AS MATERIALIZED (SELECT substr(md5(c), 1, 8) AS id, c AS spell FROM wch)""" +
      (1 to WpRounds).map(r => wpRoundCtes(r)).mkString(",", ",", "")

  /** Greedy longest-match encode chain on top of [[wpTrainCtes]]: the
    * deduped vocabulary spellings, the per-(word, position) longest
    * match `wlm` (single chars always match — the walk cannot stall),
    * and the recursive walk whose terminal `n` is the token count. */
  private val wpEncodeCtes: String = s"""
      wv AS MATERIALIZED (SELECT DISTINCT spell, CAST(len(spell) AS INT) AS sl
             FROM sp$WpRounds),
      wdw AS MATERIALIZED (SELECT DISTINCT w, len(w) AS wl FROM wf),
      wpos AS MATERIALIZED (SELECT w, CAST(unnest(range(1, wl + 1)) AS INT) AS pos
               FROM wdw),
      wlm AS MATERIALIZED (SELECT p.w, p.pos, MAX(v.sl) AS L
              FROM wpos p JOIN wv v ON substr(p.w, p.pos, v.sl) = v.spell
              GROUP BY p.w, p.pos),
      walk(w, pos, n) AS (
        SELECT w, 1, 0 FROM wdw
        UNION ALL
        SELECT walk.w, walk.pos + wlm.L, walk.n + 1
        FROM walk JOIN wlm ON wlm.w = walk.w AND wlm.pos = walk.pos),
      wwp AS MATERIALIZED (SELECT w, CAST(MAX(n) AS BIGINT) AS n_wp FROM walk GROUP BY w)"""

  /** MARKED WordPiece training chain (q228/q229 — BERT's actual
    * alphabet): w0 gives the word's first character its plain md5
    * symbol and every later character the `##`-prefixed symbol, so
    * word-initial and continuation units are distinct symbols with
    * separate statistics from round zero; sp0 carries the `cont` flag
    * and spells stay CONSUMABLE text (the marker lives in the id). */
  private val mwpTrainCtes: String = s"""wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      w0 AS (SELECT w, freq,
               array_to_string(list_transform(range(1, len(w) + 1),
                 i -> $sepSql || substr(md5(CASE WHEN i = 1
                        THEN substr(w, CAST(i AS INT), 1)
                        ELSE '##' || substr(w, CAST(i AS INT), 1) END), 1, 8)),
                 '') AS repr
             FROM wf),
      wch AS MATERIALIZED (SELECT DISTINCT CAST(i > 1 AS INT) AS cont,
                substr(w, CAST(i AS INT), 1) AS c
              FROM (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM wf)),
      sp0 AS MATERIALIZED (SELECT substr(md5(CASE WHEN cont = 1
                 THEN '##' || c ELSE c END), 1, 8) AS id,
               c AS spell, cont FROM wch)""" +
      (1 to WpRounds).map(r => wpRoundCtes(r, marked = true))
        .mkString(",", ",", "")

  /** MARKED encode chain: position 1 may only consume word-initial
    * units, positions > 1 only continuation units (MaxMatch under
    * BERT's rule). Completeness on the training corpus is structural:
    * both single-char classes were observed at their positions. */
  private val mwpEncodeCtes: String = s"""
      wv AS MATERIALIZED (SELECT DISTINCT spell, CAST(len(spell) AS INT) AS sl, cont
             FROM sp$WpRounds),
      wdw AS MATERIALIZED (SELECT DISTINCT w, len(w) AS wl FROM wf),
      wpos AS MATERIALIZED (SELECT w, CAST(unnest(range(1, wl + 1)) AS INT) AS pos
               FROM wdw),
      wlm AS MATERIALIZED (SELECT p.w, p.pos, MAX(v.sl) AS L
              FROM wpos p JOIN wv v ON substr(p.w, p.pos, v.sl) = v.spell
                                   AND (p.pos = 1) = (v.cont = 0)
              GROUP BY p.w, p.pos),
      walk(w, pos, n) AS (
        SELECT w, 1, 0 FROM wdw
        UNION ALL
        SELECT walk.w, walk.pos + wlm.L, walk.n + 1
        FROM walk JOIN wlm ON wlm.w = walk.w AND wlm.pos = walk.pos),
      wwp AS MATERIALIZED (SELECT w, CAST(MAX(n) AS BIGINT) AS n_wp FROM walk GROUP BY w)"""

  /** q219 — WordPiece vocabulary induction (N46): [[WpRounds]]
    * likelihood-scored merge rounds (Schuster & Nakajima '12) over the
    * same word-frequency table as q194; output = the merge table with
    * its exact-integer score evidence (pair count + both unigram
    * counts — the score itself is derived, never stored, so the hash
    * gate stays integer-exact). Same scale shape as BPE training: one
    * corpus pass, then Heaps'-law-table rounds, each one
    * map-side-combined aggregate + a 1-row argmax collect. */
  val q219 = Q(
    "q219_wordpiece_train",
    (s, dir) => {
      import s.implicits._
      val words = BpeVocab.wordTable(Tables(s, dir, "documents"), "text")
      val (merges, _) = graft.operators.WordPieceVocab.train(words, WpRounds)
      graft.operators.WordPieceVocab.mergesDf(s, merges).orderBy($"round")
    },
    Some(s"""
      WITH $wpTrainCtes
      ${(1 to WpRounds).map(r =>
        s"SELECT $r AS round, a, b, m AS merged, cnt, ca, cb FROM wt$r")
        .mkString("\n      UNION ALL ")}
      ORDER BY round"""),
    doc = "N46: WordPiece training (Schuster & Nakajima '12) — likelihood " +
      "score cnt/(ca*cb) argmax per round (one IEEE divide, cross-engine " +
      "exact), BPE's one-corpus-pass + word-table-rounds scale shape")

  /** q220 — WordPiece greedy longest-match encode (N46b): apply the
    * q219 vocabulary by MaxMatch — per word, repeatedly consume the
    * longest vocabulary unit prefixing the remainder (BERT's inference
    * tokenizer; BPE replays merges, WordPiece matches greedily — a
    * genuinely different encode algebra, which is the point of the
    * second family). Per document: whitespace token count and
    * WordPiece token count. The walk runs on the DISTINCT-word table
    * for ≤ max-word-length rounds; the corpus joins the finished
    * (w, n_wp) table on the word key (q195's posture). Oracle: the
    * same longest-match table + a recursive walk whose terminal step
    * count is the token count. */
  val q220 = Q(
    "q220_wordpiece_encode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.WordPieceVocab
      val docs = Tables(s, dir, "documents")
      val words = BpeVocab.wordTable(docs, "text")
      val (merges, _) = WordPieceVocab.train(words, WpRounds)
      val vocab = WordPieceVocab.vocabSpellings(words, merges)
      val wp = WordPieceVocab.wordPieceCounts(words, vocab)
      docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(wp, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"n_wp").as("n_wp"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $wpTrainCtes,
      $wpEncodeCtes,
      wtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(wwp.n_wp) AS BIGINT) AS n_wp
      FROM wtoks t JOIN wwp ON t.w = wwp.w
      WHERE len(t.w) > 0
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    doc = "N46b: WordPiece MaxMatch encode — longest-match table over the " +
      "distinct-word table x broadcast vocabulary, character-bounded walk " +
      "rounds, corpus joins on the word key; oracle walks a recursive CTE")

  /** q221 — pack by WordPiece counts (X99): q214's composition thesis
    * closed over the SECOND tokenizer family — the packing algebra
    * ([[Text.packingMapFromCounts]]: empty-group PrefixScan, fluid
    * fill, straddle flags) is count-agnostic, and this proves it on
    * counts produced by a greedy-matching encoder rather than a
    * merge-replay one. A drift between encoder and packer counts
    * silently shifts every downstream bin id; only the end-to-end
    * hash catches it (q210's thesis). */
  val q221 = Q(
    "q221_wordpiece_packing",
    (s, dir) => {
      import s.implicits._
      import graft.operators.WordPieceVocab
      val docs = Tables(s, dir, "documents")
      val words = BpeVocab.wordTable(docs, "text")
      val (merges, _) = WordPieceVocab.train(words, WpRounds)
      val vocab = WordPieceVocab.vocabSpellings(words, merges)
      val wp = WordPieceVocab.wordPieceCounts(words, vocab)
      val counts = docs
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(wp, "w")
        .groupBy($"doc_id")
        .agg(sum($"n_wp").cast("long").as("n_tok"))
      Text.packingMapFromCounts(counts, L = 128)
        .orderBy($"doc_id", $"bin_id")
    },
    Some(s"""
      WITH RECURSIVE $wpTrainCtes,
      $wpEncodeCtes,
      wtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents),
      d AS (SELECT t.doc_id, CAST(SUM(wwp.n_wp) AS BIGINT) AS n_tok
            FROM wtoks t JOIN wwp ON t.w = wwp.w
            WHERE len(t.w) > 0 GROUP BY t.doc_id),
      cum AS (SELECT doc_id, n_tok,
                CAST(SUM(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
              FROM d WHERE n_tok > 0),
      e AS (SELECT doc_id, cum, cum - n_tok AS st,
              (cum - n_tok) // 128 AS b0, (cum - 1) // 128 AS b1
            FROM cum),
      x AS (SELECT doc_id, st, cum, b0, b1, unnest(range(b0, b1 + 1)) AS bin_id
            FROM e)
      SELECT doc_id, CAST(bin_id AS BIGINT) AS bin_id,
             CAST(GREATEST(st, bin_id * 128) - bin_id * 128 AS BIGINT) AS bin_off,
             CAST(GREATEST(st, bin_id * 128) - st AS BIGINT) AS doc_off,
             CAST(LEAST(cum, (bin_id + 1) * 128)
               - GREATEST(st, bin_id * 128) AS BIGINT) AS seg_len,
             CAST(b1 > b0 AS INT) AS split
      FROM x ORDER BY doc_id, bin_id"""),
    doc = "X99: pack by WordPiece counts — the count-agnostic packing " +
      "algebra proven on the second tokenizer family; greedy-match counts " +
      "feed q209's math, end-to-end hash-checked composition")

  /** q228 — MARKED WordPiece training (N46c): q219 under BERT's
    * actual symbol alphabet — the word-initial/continuation `##`
    * distinction lives in the symbols themselves
    * ([[graft.operators.WordPieceVocab.markedWordTable]]), so
    * "unit-as-prefix" and "unit-as-suffix" carry SEPARATE statistics
    * and the likelihood argmax learns a genuinely different merge
    * table (PqBpeSpec pins the divergence — the marker is
    * load-bearing, not cosmetic). Training algebra, scale shape, and
    * determinism device are [[WordPieceVocab.train]] verbatim: the
    * marker changes WHICH symbols exist, not how they merge. */
  val q228 = Q(
    "q228_wordpiece_marked_train",
    (s, dir) => {
      import s.implicits._
      import graft.operators.WordPieceVocab
      val words = WordPieceVocab
        .markedWordTable(Tables(s, dir, "documents"), "text")
      val (merges, _) = WordPieceVocab.train(words, WpRounds)
      WordPieceVocab.mergesDf(s, merges).orderBy($"round")
    },
    Some(s"""
      WITH $mwpTrainCtes
      ${(1 to WpRounds).map(r =>
        s"SELECT $r AS round, a, b, m AS merged, cnt, ca, cb FROM wt$r")
        .mkString("\n      UNION ALL ")}
      ORDER BY round"""),
    doc = "N46c: marked WordPiece training — ## continuation symbols from " +
      "round zero (BERT's alphabet), initial/continuation units carry " +
      "separate statistics; same likelihood argmax, same scale shape")

  /** q229 — MARKED WordPiece encode (N46d): MaxMatch under BERT's
    * positional rule — position 1 consumes only word-initial units,
    * later positions only continuation units. Completeness on the
    * training corpus is structural (both single-char classes observed
    * at their positions), so the walk cannot stall without any
    * artificial alphabet closure. Counts genuinely differ from
    * q220's unmarked run on the same corpus — the per-position vocab
    * split changes both the learned units and what may match where. */
  val q229 = Q(
    "q229_wordpiece_marked_encode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.WordPieceVocab
      val docs = Tables(s, dir, "documents")
      val words = WordPieceVocab.markedWordTable(docs, "text")
      val (merges, _) = WordPieceVocab.train(words, WpRounds)
      val vocab = WordPieceVocab.markedVocabSpellings(words, merges)
      val wp = WordPieceVocab.markedWordPieceCounts(words, vocab)
      docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(wp, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"n_wp").as("n_wp"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $mwpTrainCtes,
      $mwpEncodeCtes,
      wtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(wwp.n_wp) AS BIGINT) AS n_wp
      FROM wtoks t JOIN wwp ON t.w = wwp.w
      WHERE len(t.w) > 0
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    doc = "N46d: marked WordPiece MaxMatch — initial units at position 1, " +
      "## continuation units after; positionally-split longest-match table, " +
      "character-bounded walk, recursive-CTE oracle twin")

  val all: Seq[Q] = Seq(q194, q195, q214, q219, q220, q221, q228, q229)
}
