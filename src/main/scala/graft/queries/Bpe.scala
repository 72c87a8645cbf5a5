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

  // ---- Unigram-LM (N47/N47b/X103 — the third tokenizer family) ----

  private val UgPieceLen = 4
  private val UgRounds = 2
  private val UgPruneK = 6

  /** Bellman iterations for the oracle's suffix DP — a STATIC bound
    * (DuckDB SQL cannot size itself to the data): must be ≥ the max
    * pieces in any segmentation = the max word length. Corpus words
    * are ≤ 8 chars; 12 leaves margin, and extra rounds are idempotent
    * (the DP is monotone and converges). The Spark side iterates the
    * exact data-derived max length, so both reach the same fixpoint —
    * [[ugGuard]] asserts the assumption engine-side. */
  private val UgDpRounds = 12

  /** Engine-side assertion of the oracle's static bound: a corpus word
    * longer than [[UgDpRounds]] would silently under-converge the
    * DuckDB DP (the walk stalls, counts diverge) and surface only as
    * an unexplained hash mismatch in the harness — failing HERE names
    * the bound instead. */
  private def ugGuard(words: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val maxLen = words
      .agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0)
    require(maxLen <= UgDpRounds,
      s"corpus max word length $maxLen exceeds the q235-q237 oracle's " +
        s"static UgDpRounds=$UgDpRounds suffix-DP Bellman bound - the " +
        "DuckDB twin would under-converge; raise UgDpRounds")
    words
  }

  /** Seed + shared grids: seed pieces with exact occurrence mass,
    * the frozen score table uv0 (freq/total — ONE exact divide each,
    * never renormalized), the distinct-word table and position grid. */
  private val ugSeedCtes: String = s"""
      useed AS MATERIALIZED (
        SELECT spell, CAST(SUM(freq) AS BIGINT) AS freq FROM (
          SELECT freq, unnest(list_transform(range(1, len(w) - l + 2),
            i -> substr(w, CAST(i AS INT), CAST(l AS INT)))) AS spell
          FROM wf CROSS JOIN (SELECT unnest(range(1, ${UgPieceLen + 1})) AS l) ll
          WHERE len(w) >= l)
        GROUP BY spell),
      utot AS (SELECT CAST(SUM(freq) AS BIGINT) AS tot FROM useed),
      uv0 AS MATERIALIZED (SELECT spell, CAST(len(spell) AS INT) AS sl, freq,
               CAST(freq AS DOUBLE) / CAST(tot AS DOUBLE) AS sc
             FROM useed CROSS JOIN utot),
      udw AS MATERIALIZED (SELECT DISTINCT w, CAST(len(w) AS INT) AS wl FROM wf),
      upos AS MATERIALIZED (SELECT w, CAST(unnest(range(1, wl + 1)) AS INT) AS pos
               FROM udw)"""

  /** One Viterbi pass under vocabulary uv{r-1}: match table um$r,
    * suffix-DP rounds uf${r}_k (products built right-to-left —
    * `m.sc * f.f` — mirroring the Spark fold order so every double is
    * bit-identical), deterministic best step ubs$r (the piece whose
    * product EQUALS the DP optimum; ties longest-then-lexicographic),
    * the recursive walk, and per-piece corpus usage uus$r. With
    * `prune`, adds the usage-argmin prune set upr$r and the surviving
    * vocabulary uv$r. */
  private def ugPassCtes(r: Int, prune: Boolean): String = {
    val dp = (1 to UgDpRounds).map { k =>
      s"""
      uf${r}_$k AS MATERIALIZED (
        SELECT w, pos, MAX(f) AS f FROM (
          SELECT w, pos, f FROM uf${r}_${k - 1}
          UNION ALL
          SELECT m.w, m.pos, m.sc * f.f AS f
          FROM um$r m JOIN uf${r}_${k - 1} f
            ON f.w = m.w AND f.pos = m.pos + m.sl)
        GROUP BY w, pos)"""
    }.mkString(",")
    val core = s"""
      um$r AS MATERIALIZED (SELECT p.w, p.pos, v.sl, v.spell, v.sc
             FROM upos p JOIN uv${r - 1} v ON substr(p.w, p.pos, v.sl) = v.spell),
      uf${r}_0 AS (SELECT w, wl + 1 AS pos, CAST(1.0 AS DOUBLE) AS f FROM udw),
      $dp,
      ubs$r AS MATERIALIZED (SELECT w, pos, sl, spell FROM (
        SELECT m.w, m.pos, m.sl, m.spell,
          row_number() OVER (PARTITION BY m.w, m.pos
                             ORDER BY m.sl DESC, m.spell) AS rn
        FROM um$r m
        JOIN uf${r}_$UgDpRounds nx ON nx.w = m.w AND nx.pos = m.pos + m.sl
        JOIN uf${r}_$UgDpRounds cu ON cu.w = m.w AND cu.pos = m.pos
        WHERE m.sc * nx.f = cu.f) WHERE rn = 1),
      uwalk$r(w, pos, n) AS (
        SELECT w, 1, 0 FROM udw
        UNION ALL
        SELECT k.w, k.pos + b.sl, k.n + 1
        FROM uwalk$r k JOIN ubs$r b ON b.w = k.w AND b.pos = k.pos)"""
    if (!prune) core
    else core + s""",
      uus$r AS MATERIALIZED (SELECT b.spell,
          CAST(SUM(wf.freq) AS BIGINT) AS usage
        FROM uwalk$r k JOIN ubs$r b ON b.w = k.w AND b.pos = k.pos
        JOIN wf ON wf.w = k.w GROUP BY b.spell),
      upr$r AS MATERIALIZED (
        SELECT spell, freq, usage FROM (
          SELECT v.spell, v.freq, COALESCE(u.usage, CAST(0 AS BIGINT)) AS usage
          FROM uv${r - 1} v LEFT JOIN uus$r u ON u.spell = v.spell
          WHERE v.sl >= 2)
        ORDER BY usage ASC, spell ASC LIMIT $UgPruneK),
      uv$r AS MATERIALIZED (SELECT v.spell, v.sl, v.freq, v.sc
        FROM uv${r - 1} v ANTI JOIN upr$r p ON v.spell = p.spell)"""
  }

  private val ugTrainCtes: String =
    wordCtes + "," + ugSeedCtes +
      (1 to UgRounds).map(r => ugPassCtes(r, prune = true))
        .mkString(",", ",", "")

  /** Final segmentation pass under the surviving vocabulary plus the
    * per-word piece-count table uwp. */
  private val ugEncodeCtes: String = {
    val f = UgRounds + 1
    ugPassCtes(f, prune = false) + s""",
      uwp AS MATERIALIZED (SELECT w, CAST(MAX(n) AS BIGINT) AS n_up
        FROM uwalk$f GROUP BY w)"""
  }

  /** q235 — Unigram-LM vocabulary induction (N47, Kudo '18 /
    * SentencePiece): the THIRD tokenizer family, completing the triad —
    * trained by PRUNING a seed vocabulary (every corpus substring up to
    * ${4} chars with exact occurrence mass) instead of growing one.
    * Each round Viterbi-segments the corpus under the frozen
    * freq/total scores and prunes the ${6} lowest-USAGE length-≥2
    * pieces (exact-integer evidence; the declared stand-in for Kudo's
    * log-likelihood loss ranking, which no hash gate can carry —
    * see [[graft.operators.UnigramLm]]). Output: the pruned pieces
    * per round with usage + mass evidence. */
  val q235 = Q(
    "q235_unigram_train",
    (s, dir) => {
      import s.implicits._
      val words = ugGuard(BpeVocab.wordTable(Tables(s, dir, "documents"), "text"))
      val (pruned, _) = graft.operators.UnigramLm
        .train(words, UgPieceLen, UgRounds, UgPruneK)
      pruned.toDF().select($"round", $"spell", $"usage", $"freq")
        .orderBy($"round", $"spell")
    },
    Some(s"""
      WITH RECURSIVE $ugTrainCtes
      ${(1 to UgRounds).map(r =>
        s"SELECT $r AS round, spell, usage, freq FROM upr$r")
        .mkString("\n      UNION ALL ")}
      ORDER BY round, spell"""),
    doc = "N47: Unigram-LM (SentencePiece) training — substring seed vocab " +
      "with frozen exact freq/total scores, per-round Viterbi suffix DP " +
      "(IEEE-deterministic right-to-left products) + usage-argmin prune; " +
      "integer usage evidence, oracle replays the DP as chained CTEs")

  /** q236 — Unigram-LM Viterbi encode (N47b): segment the corpus under
    * the q235-trained vocabulary by exact max-product Viterbi — q220's
    * bounded join-walk device with the DP argmax step instead of
    * longest-match (the THIRD encode algebra: BPE replays, WordPiece
    * greedy-matches, Unigram maximizes likelihood). Per document:
    * whitespace token count and Viterbi piece count. */
  val q236 = Q(
    "q236_unigram_encode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.UnigramLm
      val docs = Tables(s, dir, "documents")
      val words = ugGuard(BpeVocab.wordTable(docs, "text"))
      val (_, vocab) = UnigramLm.train(words, UgPieceLen, UgRounds, UgPruneK)
      val seg = UnigramLm.viterbiSegments(words, vocab, UgPieceLen)
        .select($"w", $"n_up")
      docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(seg, "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"n_up").as("n_up"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $ugTrainCtes,
      $ugEncodeCtes,
      utoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(uwp.n_up) AS BIGINT) AS n_up
      FROM utoks t JOIN uwp ON t.w = uwp.w
      WHERE len(t.w) > 0
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    doc = "N47b: Unigram-LM Viterbi encode — suffix-DP optimum + " +
      "deterministic argmax walk (ties longest-then-lexicographic); " +
      "oracle replays the DP rounds and walks a recursive CTE")

  /** q237 — pack by Unigram-LM counts (X103): the packing algebra's
    * count-agnostic claim closed over the THIRD tokenizer family —
    * bins land on Viterbi piece arithmetic; a drift between encoder
    * and packer silently shifts every downstream bin id and only the
    * end-to-end hash catches it (q210's thesis, third member). */
  val q237 = Q(
    "q237_unigram_packing",
    (s, dir) => {
      import s.implicits._
      import graft.operators.UnigramLm
      val docs = Tables(s, dir, "documents")
      val words = ugGuard(BpeVocab.wordTable(docs, "text"))
      val (_, vocab) = UnigramLm.train(words, UgPieceLen, UgRounds, UgPruneK)
      val seg = UnigramLm.viterbiSegments(words, vocab, UgPieceLen)
        .select($"w", $"n_up")
      val counts = docs
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .filter(length($"w") > 0)
        .join(seg, "w")
        .groupBy($"doc_id")
        .agg(sum($"n_up").cast("long").as("n_tok"))
      Text.packingMapFromCounts(counts, L = 128)
        .orderBy($"doc_id", $"bin_id")
    },
    Some(s"""
      WITH RECURSIVE $ugTrainCtes,
      $ugEncodeCtes,
      utoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents),
      d AS (SELECT t.doc_id, CAST(SUM(uwp.n_up) AS BIGINT) AS n_tok
            FROM utoks t JOIN uwp ON t.w = uwp.w
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
    doc = "X103: pack by Unigram-LM Viterbi counts — the packing algebra " +
      "proven count-agnostic on the third tokenizer family; end-to-end " +
      "hash-checked composition")

  /** q276 — the SUB-WORD index: compressed postings over BPE symbols
    * (N37f, r15). Every index so far keys on whitespace words; an LLM
    * serving/data system indexes what its TOKENIZER emits — sub-word
    * units — so the same text is searchable at the grain the model
    * reads (code search, tokenizer-drift audits, membership probes
    * all run here). This composes the two families end to end: the
    * q194-trained vocabulary segments the corpus (q195's join), each
    * document becomes a SYMBOL stream with deterministic coordinates
    * (pos = word_pos·64 + symbol_index — a declared stride both
    * engines replay; engine-side require pins symbols-per-word < 64
    * where a violation would alias coordinates), the stream builds a
    * q258-layout compressed store keyed by symbol, and a 3-symbol
    * probe (the md5-derived symbols of 'a'/'e'/'s' — computed, not
    * hard-coded, so both engines derive them) ranks documents from
    * the DECODED byte streams alone. The oracle replays training,
    * segmentation, coordinates, and the search straight from raw
    * documents — the index never enters it.
    *
    * Scale: training/segmentation are q194/q195's postures (word
    * table is Heaps'-law-sized); the symbol stream is corpus-token-
    * sized with compact (symbol, bucket) keys; probe cost =
    * Σ df(query symbols) rows. */
  val q276 = Q(
    "q276_subword_index",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val words = BpeVocab.wordTable(docs, "text")
      val (_, finalWords) = BpeVocab.train(words, Rounds)
      // stride contract enforced in-plan: a word splitting into >= 64
      // symbols would alias into the next word's coordinate range
      val vocab = finalWords
        .select($"w", BpeVocab.syms($"repr").as("sy"))
        .withColumn("sy", when(size($"sy") <= 63, $"sy")
          .otherwise(raise_error(lit(
            "q276: word splits into >= 64 symbols - stride aliasing"))))
      val qSyms = Seq("a", "e", "s").map(c =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(c).substring(0, 8))
      val store = docs
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", ($"pos" + 1).as("wpos"), $"col".as("w"))
        .filter(length($"w") > 0)
        .join(vocab, "w")
        .select($"doc_id", $"wpos", posexplode($"sy"))
        .select($"doc_id", $"col".as("sym"),
          ($"wpos" * 64 + $"pos" + 1).cast("long").as("spos"))
        .groupBy($"sym", $"doc_id")
        .agg(count(lit(1)).as("tf"), min($"spos").as("first_pos"))
        .groupBy($"sym", floor($"doc_id" / 100).as("bucket"))
        .agg(sort_array(collect_list(
          struct($"doc_id", $"tf", $"first_pos"))).as("ps"))
        .as[(String, Long, Seq[(Long, Long, Long)])]
        .map { case (sym, bucket, ps) =>
          // q258's device: assert the oracle's 4-tier varint bound where
          // a violation would start, not at an unexplained hash mismatch
          require(ps.head._1 < (1L << 28) &&
            ps.forall(p => p._2 < (1L << 28) && p._3 < (1L << 28)),
            "q276: value exceeds the oracle's 4-tier varint bound")
          (sym, bucket, ps.size,
            graft.operators.PostingCodec.encode(ps))
        }
        .toDF("sym", "bucket", "df", "bytes")
      store.filter($"sym".isin(qSyms: _*))
        .as[(String, Long, Int, Array[Byte])]
        .flatMap { case (t, b, n, bytes) =>
          graft.operators.PostingCodec.decode(bytes, n)
            .getOrElse(throw new IllegalStateException(
              s"q276: corrupt subword block '$t'/$b"))
            .map { case (doc, tf, fp) => (t, doc, tf, fp) }
        }.toDF("sym", "doc_id", "tf", "first_pos")
        .groupBy($"doc_id")
        .agg(count_distinct($"sym").as("n_syms"),
          sum($"tf").as("tf_sum"), min($"first_pos").as("first_hit"))
        .orderBy($"n_syms".desc, $"tf_sum".desc, $"doc_id")
        .limit(50)
    },
    Some(s"""
      WITH $trainCtes,
      vocab AS (SELECT w, list_filter(string_split(repr, $sepSql),
                  x -> x <> '') AS sy
                FROM w$Rounds),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                 CAST(unnest(range(1, len(string_split(text, ' ')) + 1))
                   AS BIGINT) AS wpos
               FROM documents),
      j AS (SELECT doc_id, wpos, sy FROM toks JOIN vocab USING (w)
            WHERE len(w) > 0),
      sm AS (SELECT doc_id, unnest(sy) AS sym,
               wpos * 64 + CAST(unnest(range(1, len(sy) + 1)) AS BIGINT)
                 AS spos
             FROM j),
      h AS (SELECT doc_id, sym, spos FROM sm
            WHERE sym IN (substr(md5('a'), 1, 8), substr(md5('e'), 1, 8),
                          substr(md5('s'), 1, 8)))
      SELECT doc_id, CAST(COUNT(DISTINCT sym) AS BIGINT) AS n_syms,
             CAST(COUNT(*) AS BIGINT) AS tf_sum,
             CAST(MIN(spos) AS BIGINT) AS first_hit
      FROM h GROUP BY doc_id
      ORDER BY n_syms DESC, tf_sum DESC, doc_id LIMIT 50"""),
    doc = "N37f: sub-word index — q258-layout compressed postings keyed " +
      "by BPE SYMBOL (the grain the model reads), coordinates = " +
      "word_pos*64 + symbol_index (declared stride, engine-side bound " +
      "require); a 3-symbol probe ranks from decoded streams; the " +
      "oracle replays training, segmentation, coordinates and search " +
      "from raw documents")

  val all: Seq[Q] = Seq(q194, q195, q214, q219, q220, q221, q228, q229,
    q235, q236, q237, q276)
}
