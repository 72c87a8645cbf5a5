package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.core.{Q, Tables}
import graft.pipeline.CorpusPipeline
import graft.core.Barriers._

/** SURVEY.md §2.11a X26, promoted to the oracle registry (r5 verdict
  * item 6): the composed corpus-preparation pipeline — quality filter →
  * exact dedup → near-dup cluster collapse → token accounting — checked
  * end to end against a DuckDB twin, not just stage by stage. The
  * composition is the product surface a reference user actually runs
  * (`graft.pipeline.CorpusPipeline`); its stages were each
  * oracle-checked alone (q73/q49/q54+q82/q71), but stage composition
  * has its own failure modes (a survivor set fed to the wrong stage, an
  * off-by-one in the keep rule) that only an end-to-end hash can catch.
  */
object Pipeline {

  /** q186 — pipeline output: 4 stage-count rows + the survivor set in
    * ONE frame, (kind, id, n):
    *   - `stage_*` rows carry id = -1 and n = the stage's surviving
    *     doc count (input → quality → exact dedup → near-dup collapse,
    *     monotone non-increasing);
    *   - `doc` rows carry the surviving doc_id and its n_tokens.
    * Both engines compose the SAME stage definitions the per-stage
    * oracles use: the Gopher word-count/mean-word-length gate, min-id
    * representative per sha256(lower(text)), and the shared MinHash
    * CTE pipeline + recursive-CTE components (q54/q82's twins) over
    * the exact-dedup survivors.
    *
    * Scale: the Spark side IS CorpusPipeline.prepare — one corpus scan
    * through the gates, LSH banding with the viral-bucket cap, O(log²)
    * CC rounds; the stage counts here are declarative aggregates over
    * the exposed stage frames (the production path reads observe()
    * metrics instead — zero extra passes; see CorpusPipeline scaladoc). */
  val q186 = Q(
    "q186_corpus_pipeline",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id", $"text")
      val p = CorpusPipeline.prepare(docs, "doc_id", "text")
      val stages = Seq(
        "stage_0_input" -> p.input,
        "stage_1_quality" -> p.quality,
        "stage_2_exact" -> p.exact,
        "stage_3_near" -> p.result)
        .map { case (k, df) =>
          df.agg(count(lit(1)).as("n"))
            .select(lit(k).as("kind"), lit(-1L).as("id"), $"n")
        }
        .reduce(_ unionByName _)
      val survivors = p.result.select(lit("doc").as("kind"),
        $"doc_id".as("id"), $"n_tokens".cast(LongType).as("n"))
      // the global sort's range-sampling pass would re-run every stage
      // branch (4 corpus-scanning aggregates + the survivor chain) a
      // second time; materialize the small result first
      stages.unionByName(survivors).barrier().orderBy($"kind", $"id")
    },
    Some(s"""
      WITH RECURSIVE
      corpus0 AS (SELECT doc_id, text FROM documents),
      q AS (SELECT doc_id, text,
              len(regexp_split_to_array(text, '\\s+')) AS n_words
            FROM corpus0
            WHERE len(regexp_split_to_array(text, '\\s+')) BETWEEN 5 AND 5000
              AND length(regexp_replace(text, '\\s+', '', 'g')) /
                  len(regexp_split_to_array(text, '\\s+')) <= 12.0),
      ex AS (SELECT doc_id, text FROM (
               SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY sha256(lower(text))) AS rep
               FROM q) z
             WHERE doc_id = rep),
      ${Dedup.minhashCtes("SELECT doc_id, text FROM ex")},
      pairs AS (SELECT a_id, b_id FROM v
                WHERE inter / (na + nb - inter) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach(node, lab) AS (
        SELECT doc_id, doc_id FROM ex
        UNION
        SELECT e.src, r.lab FROM reach r JOIN edges e ON r.node = e.dst),
      kept AS (SELECT ex.doc_id, ex.text FROM ex
               JOIN (SELECT node, MIN(lab) AS component FROM reach GROUP BY 1) c
                 ON ex.doc_id = c.node
               WHERE ex.doc_id = c.component),
      stages AS (
        SELECT 'stage_0_input' AS kind, CAST(-1 AS BIGINT) AS id,
               CAST((SELECT COUNT(*) FROM corpus0) AS BIGINT) AS n
        UNION ALL
        SELECT 'stage_1_quality', -1, CAST((SELECT COUNT(*) FROM q) AS BIGINT)
        UNION ALL
        SELECT 'stage_2_exact', -1, CAST((SELECT COUNT(*) FROM ex) AS BIGINT)
        UNION ALL
        SELECT 'stage_3_near', -1, CAST((SELECT COUNT(*) FROM kept) AS BIGINT)),
      docs_out AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS id,
                     CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
                   FROM kept)
      SELECT kind, id, n FROM stages
      UNION ALL
      SELECT kind, id, n FROM docs_out
      ORDER BY kind, id"""),
    doc = "X26 composed corpus pipeline end-to-end — quality gate, min-id " +
      "exact dedup, MinHash+CC near-dup collapse, token accounting; stage " +
      "counts + survivor set in one hash-checked frame")

  /** q190 — the pipeline with the OPTIONAL semantic-prune stage (r8):
    * quality → exact dedup → near-dup collapse → SemDeDup over the
    * survivors' embeddings — the full Abbas-'23 composition where
    * syntactic dedup feeds the semantic diversity cut
    * ([[graft.pipeline.CorpusPipeline.prepareSemantic]]). Output shape
    * is q186's frame plus a `stage_4_sem` count row; `doc` rows are
    * the post-semantic survivor set.
    *
    * The oracle composes the SAME twins the per-stage oracles use —
    * q186's gate/dedup/CC CTEs, then q118's k-means CTEs
    * parameterized over the near-dup survivors' embeddings (an id set
    * WITH gaps — the reason kmeansCtes seeds by `ORDER BY vec_id
    * LIMIT 8`, not `vec_id < 8`), then q187's cluster-scoped cosine
    * prune. Docs without an embedding row pass through unjudged (the
    * Spark side anti-joins DROPPED ids, mirrored by the oracle's
    * LEFT JOIN ... IS NULL). */
  val q190 = Q(
    "q190_corpus_pipeline_sem",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id", $"text")
      val emb = Tables(s, dir, "embeddings").select($"vec_id", $"embedding")
      val p = CorpusPipeline.prepareSemantic(
        docs, "doc_id", "text", emb, "vec_id", "embedding")
      val stages = Seq(
        "stage_0_input" -> p.input,
        "stage_1_quality" -> p.quality,
        "stage_2_exact" -> p.exact,
        "stage_3_near" -> p.near,
        "stage_4_sem" -> p.result)
        .map { case (k, df) =>
          df.agg(count(lit(1)).as("n"))
            .select(lit(k).as("kind"), lit(-1L).as("id"), $"n")
        }
        .reduce(_ unionByName _)
      val survivors = p.result.select(lit("doc").as("kind"),
        $"doc_id".as("id"), $"n_tokens".cast(LongType).as("n"))
      // same device as q186: materialize the small result before the
      // global sort so orderBy's sampling pass cannot replay the stage
      // branches
      stages.unionByName(survivors).barrier().orderBy($"kind", $"id")
    },
    Some(s"""
      WITH RECURSIVE
      corpus0 AS (SELECT doc_id, text FROM documents),
      q AS (SELECT doc_id, text,
              len(regexp_split_to_array(text, '\\s+')) AS n_words
            FROM corpus0
            WHERE len(regexp_split_to_array(text, '\\s+')) BETWEEN 5 AND 5000
              AND length(regexp_replace(text, '\\s+', '', 'g')) /
                  len(regexp_split_to_array(text, '\\s+')) <= 12.0),
      ex AS (SELECT doc_id, text FROM (
               SELECT doc_id, text,
                 MIN(doc_id) OVER (PARTITION BY sha256(lower(text))) AS rep
               FROM q) z
             WHERE doc_id = rep),
      ${Dedup.minhashCtes("SELECT doc_id, text FROM ex")},
      pairs AS (SELECT a_id, b_id FROM v
                WHERE inter / (na + nb - inter) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach(node, lab) AS (
        SELECT doc_id, doc_id FROM ex
        UNION
        SELECT e.src, r.lab FROM reach r JOIN edges e ON r.node = e.dst),
      kept AS (SELECT ex.doc_id, ex.text FROM ex
               JOIN (SELECT node, MIN(lab) AS component FROM reach GROUP BY 1) c
                 ON ex.doc_id = c.node
               WHERE ex.doc_id = c.component),
      ${Curation.kmeansCtes8x2From(
        "SELECT e.vec_id, e.embedding FROM embeddings e " +
          "JOIN kept ON e.vec_id = kept.doc_id")},
      vecs AS (
        SELECT e.vec_id, a3.cluster, e.embedding,
               sqrt(${graft.functions.VectorOps.dotSql(
                 "e.embedding", "e.embedding")}) AS nrm
        FROM embeddings e JOIN a3 ON e.vec_id = a3.vec_id),
      sem_ok AS (SELECT cluster FROM vecs GROUP BY cluster
                 HAVING COUNT(*) <= 4096),
      sem_dropped AS (
        SELECT DISTINCT y.vec_id
        FROM vecs x JOIN vecs y
          ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        JOIN sem_ok ON x.cluster = sem_ok.cluster
        WHERE ${graft.functions.VectorOps.dotSql(
          "x.embedding", "y.embedding")} /
              (x.nrm * y.nrm) >= 0.35),
      semkept AS (SELECT k.doc_id, k.text FROM kept k
                  LEFT JOIN sem_dropped d ON k.doc_id = d.vec_id
                  WHERE d.vec_id IS NULL),
      stages AS (
        SELECT 'stage_0_input' AS kind, CAST(-1 AS BIGINT) AS id,
               CAST((SELECT COUNT(*) FROM corpus0) AS BIGINT) AS n
        UNION ALL
        SELECT 'stage_1_quality', -1, CAST((SELECT COUNT(*) FROM q) AS BIGINT)
        UNION ALL
        SELECT 'stage_2_exact', -1, CAST((SELECT COUNT(*) FROM ex) AS BIGINT)
        UNION ALL
        SELECT 'stage_3_near', -1, CAST((SELECT COUNT(*) FROM kept) AS BIGINT)
        UNION ALL
        SELECT 'stage_4_sem', -1, CAST((SELECT COUNT(*) FROM semkept) AS BIGINT)),
      docs_out AS (SELECT 'doc' AS kind, CAST(doc_id AS BIGINT) AS id,
                     CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
                   FROM semkept)
      SELECT kind, id, n FROM stages
      UNION ALL
      SELECT kind, id, n FROM docs_out
      ORDER BY kind, id"""),
    doc = "X26+N33 composed: the corpus pipeline with SemDeDup as stage 4 " +
      "over near-dup survivors' embeddings; five stage counts + the " +
      "post-semantic survivor set in one hash-checked frame")

  /** Stages 1–2 of the RAG pipeline — chunk (q199's windows, with the
    * composite-id guard) → hash-once → 16-dim integer chunk vectors —
    * shared by q202 (flat-PQ serve) and q206 (IVF-pruned serve).
    * Returns a PERSISTED frame; callers unpersist after eagerly
    * barriering their output. */
  private def chunkVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ch = Text.chunkWindows(Tables(s, dir, "documents"),
      window = 32, stride = 24, keepTokens = true)
    // the doc·1024+chunk composite id is only injective while every
    // document chunks into < 1024 windows (docs ≤ ~24.5k tokens at
    // this stride); fail LOUD instead of silently colliding ids.
    // The guard is a per-row raise_error INSIDE the id projection —
    // query build stays action-free (r8 verdict: the old eager
    // agg(max).head ran a serial corpus-scan job even when the
    // result was never consumed); the check now rides the first
    // real action for free and still names the offending chunk
    val vecId = when($"chunk_id" < 1024, $"doc_id" * 1024 + $"chunk_id")
      .otherwise(raise_error(concat(
        lit("q202 composite chunk id overflows: chunk_id "), $"chunk_id",
        lit(" >= 1024 at doc_id "), $"doc_id",
        lit(" — widen the composite base for this corpus"))))
    // hash each token ONCE, then read 16 digits off the stored hash:
    // a single projection computing all dims from md5(t) re-runs the
    // md5 chain per dimension (no lambda CSE — the MinHashLSH trap);
    // the barrier stops CollapseProject re-inlining the hash column.
    // At sf0.1 the measured win is modest (~6.2 → 5.9 s B: this
    // query's floor is its ~10 scheduled jobs, q190's profile) — the
    // 16× hash cut is a per-byte saving that matters at corpus scale
    val hashed = ch.select(
        vecId.as("vec_id"),
        transform($"ctk", t => md5(t)).as("hs"))
      .barrier()
    hashed.select($"vec_id",
        transform(sequence(lit(1), lit(16)), p =>
          aggregate(transform($"hs", h =>
              conv(h.substr(p, lit(1)), 16, 10).cast("long")),
            lit(0L), _ + _)).as("xq"))
      .persist()
  }

  /** Head chunks of docs 0–2 — the serve-path query set of q202/q206. */
  private val ragQueryIds = Seq(0L, 1024L, 2048L)

  /** Exact rerank of a (q_id, vec_id) shortlist to top-5 against the
    * true chunk vectors — the decisive step of the PQ serving pattern
    * (cheap codes prune, exact math decides); |Q|·shortlist rows. */
  private def exactRerank(cv: DataFrame, shortlist: DataFrame): DataFrame = {
    import cv.sparkSession.implicits._
    import graft.operators.KMeansInt
    val w = Window.partitionBy($"q_id").orderBy($"d", $"vec_id")
    shortlist.select($"q_id", $"vec_id")
      .join(cv.select($"vec_id", $"xq".as("__xv")), "vec_id")
      .join(broadcast(cv.filter($"vec_id".isInCollection(ragQueryIds))
        .select($"vec_id".as("q_id"), $"xq".as("__xq"))), "q_id")
      .select($"q_id", $"vec_id",
        KMeansInt.sqDist($"__xv", $"__xq").as("d"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"q_id", $"rn", $"vec_id", $"d")
      .orderBy($"q_id", $"rn")
  }

  /** DuckDB twins of [[chunkVectors]] (dt0/ch/cv) — shared CTE prefix
    * of the q202 and q206 oracles. */
  private val ragChunkCtes: String = """dt0 AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
                   FROM documents),
      ch AS (SELECT doc_id, CAST(g.i AS INT) AS chunk_id,
               list_slice(tk, CAST(g.i AS INT) * 24 + 1,
                              CAST(g.i AS INT) * 24 + 32) AS ctk
             FROM dt0 CROSS JOIN LATERAL
               (SELECT unnest(range(0, CASE WHEN len(tk) > 32
                  THEN (len(tk) - 33) // 24 + 2 ELSE 1 END)) AS i) g
             WHERE len(tk) > 0),
      cv AS (SELECT doc_id * 1024 + chunk_id AS vec_id,
               list_transform(range(1, 17), p ->
                 CAST(list_sum(list_transform(ctk, t ->
                   CAST(('0x' || substr(md5(t), CAST(p AS INT), 1)) AS BIGINT)))
                   AS BIGINT)) AS xq
             FROM ch)"""

  /** DuckDB twin of the PQ index build over `cv` (m=8 × subDims=2,
    * k=4, 2 rounds) ending in codes `paf` + per-query LUT content
    * `pdt` — shared by q202/q206. */
  private val ragPqCtes: String = s"""sv AS (SELECT vec_id, CAST(s.sub AS INT) AS sub,
               list_slice(xq, CAST(s.sub AS INT) * 2 + 1,
                              CAST(s.sub AS INT) * 2 + 2) AS sxq
             FROM cv CROSS JOIN (SELECT unnest(range(0, 8)) AS sub) s),
      pc0 AS (SELECT sub, CAST(rn - 1 AS INT) AS cluster, sxq AS cq FROM (
               SELECT sub, sxq,
                      row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
               FROM sv) WHERE rn <= 4),
      ${Vectors.pqRound("pc0", "pa1", "pc1", sv = "sv", dims = 2)},
      ${Vectors.pqRound("pc1", "pa2", "pc2", sv = "sv", dims = 2)},
      paf AS (SELECT vec_id, sub, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cluster) AS rn
        FROM (SELECT sv.vec_id, sv.sub, c.cluster,
                CAST(list_sum(list_transform(range(1, 3),
                  i -> (sxq[i] - cq[i]) * (sxq[i] - cq[i]))) AS BIGINT) AS d
              FROM sv JOIN pc2 c ON sv.sub = c.sub))
        WHERE rn = 1),
      pdt AS (SELECT sv.vec_id AS q_id, c.sub, c.cluster,
               CAST(list_sum(list_transform(range(1, 3),
                 i -> (sxq[i] - cq[i]) * (sxq[i] - cq[i]))) AS BIGINT) AS d
             FROM sv JOIN pc2 c ON sv.sub = c.sub
             WHERE sv.vec_id IN (0, 1024, 2048))"""

  /** DuckDB twin of the serve tail — shortlist (top-10 ADC from
    * `scoredCte`) → exact rerank → top-5 — shared by q202/q206. */
  private def ragServeTail(scoredCte: String): String = s"""
      sl AS (SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                  ORDER BY adist, vec_id) AS rn FROM $scoredCte) WHERE rn <= 10),
      rer AS (SELECT sl.q_id, sl.vec_id,
                CAST(list_sum(list_transform(range(1, 17),
                  i -> (a.xq[i] - b.xq[i]) * (a.xq[i] - b.xq[i]))) AS BIGINT) AS d
              FROM sl JOIN cv a ON sl.vec_id = a.vec_id
              JOIN cv b ON sl.q_id = b.vec_id)
      SELECT q_id, CAST(rn AS INT) AS rn, vec_id, d FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rn
        FROM rer) WHERE rn <= 5
      ORDER BY q_id, rn"""

  /** q202 — RAG indexing + serving pipeline (X89): the retrieval
    * counterpart of q186's curation pipeline — every stage is an
    * already-audited operator, composed end to end:
    *
    *   1. chunk: [[Text.chunkWindows]] (q199) — 32-token windows,
    *      stride 24, chunk identity doc_id·1024 + chunk_id (chunks
    *      per doc < 1024 at any plausible document length; assert
    *      upstream for pathological inputs);
    *   2. embed: deterministic 16-dim integer chunk vectors — per-dim
    *      SUM of md5-digit values over the chunk's tokens (q47's
    *      lookup-vector device, kept integer so the PQ grid needs no
    *      re-quantization);
    *   3. index: PQ codebooks m=8 × subDims=2, k=4, 2 rounds (q193's
    *      trainer on the chunk vectors);
    *   4. serve: ADC shortlist of 10 per query (the 3 head chunks of
    *      docs 0-2), then EXACT rerank of the shortlist to top-5 —
    *      the standard PQ serving pattern (cheap codes prune, exact
    *      math decides).
    *
    * Scale: chunking/embedding are per-row projections; training
    * shuffles m·k·subDims longs per round; ADC scoring is the pinned
    * zero-shuffle projection; the exact rerank touches only
    * |Q|·shortlist vectors. Hash-matched end to end — the oracle
    * chains the q199 chunk CTE, the q47-style digit sums, the q193
    * codebook CTEs (2-dim form) and the rerank. */
  val q202 = Q(
    "q202_rag_pipeline",
    (s, dir) => {
      import s.implicits._
      import graft.operators.ProductQuantizer
      val cv = chunkVectors(s, dir)
      val sub = ProductQuantizer.subVectorsQ(cv, "vec_id", m = 8, subDims = 2)
        .persist()
      val cents = ProductQuantizer.trainCodebooks(sub, "vec_id", k = 4, rounds = 2)
      val codes = ProductQuantizer.encode(sub, "vec_id", cents)
      val shortlist = ProductQuantizer.adcTopK(codes, "vec_id",
        sub.filter($"vec_id".isInCollection(ragQueryIds)), "vec_id",
        cents, m = 8, k = 4, topK = 10)
      // exact rerank of the tiny shortlist (|Q|·10 rows)
      val out = exactRerank(cv, shortlist)
        .barrier() // honors spark.graft.reliableCheckpoints (ADVICE r8)
      sub.unpersist(); cv.unpersist()
      out
    },
    Some(s"""
      WITH $ragChunkCtes,
      $ragPqCtes,
      ad AS (SELECT pdt.q_id, paf.vec_id, CAST(SUM(pdt.d) AS BIGINT) AS adist
             FROM paf JOIN pdt ON paf.sub = pdt.sub AND paf.cluster = pdt.cluster
             WHERE paf.vec_id <> pdt.q_id
             GROUP BY pdt.q_id, paf.vec_id),
      ${ragServeTail("ad")}"""),
    doc = "X89: RAG indexing+serving composed from audited stages — chunk " +
      "(q199) → integer chunk embeddings (q47 device) → PQ index (q193) → " +
      "ADC shortlist → exact rerank; cheap codes prune, exact math decides")

  /** One 16-dim coarse k-means round over `cv` (assign vs `cents` →
    * update) — the q118 CTE device at the chunk-vector width. */
  private def coarseRound16(cents: String, aOut: String, cOut: String): String = s"""
      $aOut AS (SELECT vec_id, cluster, xq FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM (SELECT cv.vec_id, g.cluster, cv.xq,
                CAST(list_sum(list_transform(range(1, 17),
                  i -> (cv.xq[i] - g.cq[i]) * (cv.xq[i] - g.cq[i]))) AS BIGINT) AS d
              FROM cv CROSS JOIN $cents g))
        WHERE rn = 1),
      $cOut AS (SELECT cluster, list(q ORDER BY pos) AS cq FROM (
        SELECT cluster, pos, CAST(SUM(v) // COUNT(*) AS BIGINT) AS q
        FROM (SELECT cluster, unnest(range(1, 17)) AS pos, unnest(xq) AS v
              FROM $aOut)
        GROUP BY cluster, pos)
        GROUP BY cluster)"""

  /** The IVF-pruned serve path (q206, parameterized so the spec can
    * set nProbe = k and pin equality with q202's flat scan): coarse
    * cells over the chunk vectors, per-query top-nProbe cell probe,
    * candidates = probed cells' members only, ADC via the broadcast
    * LUT-frame join ([[graft.operators.ProductQuantizer.lutFrame]] —
    * the r8 item-3 path, exercised here under an oracle), exact
    * rerank. */
  private[queries] def ragServeIvf(s: SparkSession, dir: String,
                                   nProbe: Int): DataFrame = {
    import s.implicits._
    import graft.operators.{KMeansInt, ProductQuantizer}
    val cv = chunkVectors(s, dir)
    val sub = ProductQuantizer.subVectorsQ(cv, "vec_id", m = 8, subDims = 2)
      .persist()
    // the coarse-cell and PQ-codebook trainings are independent eager
    // chains over the same persisted chunk vectors — overlap them
    // (guide §2.6, r19)
    val ((coarse, coarseCents), cents) = graft.core.Par.join2(
      KMeansInt.clusterWithCentsQ(cv, "vec_id", k = 8, rounds = 2),
      ProductQuantizer.trainCodebooks(sub, "vec_id", k = 4, rounds = 2))
    val codes = ProductQuantizer.encode(sub, "vec_id", cents)
    val wP = Window.partitionBy($"q_id").orderBy($"__d", $"cluster")
    val probes = cv.filter($"vec_id".isInCollection(ragQueryIds))
      .select($"vec_id".as("q_id"), $"xq")
      .crossJoin(broadcast(coarseCents))
      .withColumn("__d", KMeansInt.sqDist($"xq", $"cq"))
      .withColumn("__rn", row_number().over(wP))
      .filter($"__rn" <= nProbe)
      .select($"q_id", $"cluster".as("cell"))
    val cand = coarse.select($"vec_id", $"cluster".as("cell"))
      .join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id")
    val lutF = ProductQuantizer.lutFrame(
      sub.filter($"vec_id".isInCollection(ragQueryIds)), "vec_id",
      cents, m = 8, k = 4)
    val scored = ProductQuantizer.scoreCandidates(cand, codes, "vec_id",
      lutF, m = 8, k = 4)
    val shortlist = ProductQuantizer.boundedTopK(scored, "vec_id", topK = 10)
    val out = exactRerank(cv, shortlist).barrier()
    sub.unpersist(); cv.unpersist()
    out
  }

  /** q206 — IVF-pruned RAG serving (X89b, r8 verdict item 4): q202
    * serves its ADC shortlist over ALL codes — correct, but the
    * production shape is q196's composition: coarse cells prune WHICH
    * chunks are scored (nProbe=2 of 8 cells ⇒ the candidate stream is
    * ~¼ of the corpus), PQ codes shrink WHAT is scored, the exact
    * rerank still decides. Same index build as q202 (the shared
    * [[chunkVectors]] + PQ CTEs), plus a 16-dim integer k-means over
    * the chunk vectors for the cells; ADC runs through the broadcast
    * LUT-frame JOIN (no |Q| plan literals — the scalable query-batch
    * path, oracle-gated here). RagIvfSpec pins nProbe = k ≡ q202's
    * flat scan, the recall-floor contract.
    *
    * Scale: candidate stream is nProbe/k of the chunk corpus; every
    * other stage inherits q202's posture (per-row chunk/embed,
    * m·k·subDims-long training shuffles, broadcast k-row probe and
    * LUT tables, bounded top-k). */
  val q206 = Q(
    "q206_rag_ivf_pipeline",
    (s, dir) => ragServeIvf(s, dir, nProbe = 2),
    Some(s"""
      WITH $ragChunkCtes,
      gc0 AS (SELECT CAST(vec_id AS INT) AS cluster, xq AS cq FROM cv
              ORDER BY vec_id LIMIT 8),
      ${coarseRound16("gc0", "ga1", "gc1")},
      ${coarseRound16("gc1", "ga2", "gc2")},
      ga3 AS (SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM (SELECT cv.vec_id, g.cluster,
                CAST(list_sum(list_transform(range(1, 17),
                  i -> (cv.xq[i] - g.cq[i]) * (cv.xq[i] - g.cq[i]))) AS BIGINT) AS d
              FROM cv CROSS JOIN gc2 g))
        WHERE rn = 1),
      $ragPqCtes,
      pr AS (SELECT q_id, cell FROM (
        SELECT t.q_id, t.cluster AS cell,
               row_number() OVER (PARTITION BY t.q_id ORDER BY t.d, t.cluster) AS rn
        FROM (SELECT cv.vec_id AS q_id, g.cluster,
                CAST(list_sum(list_transform(range(1, 17),
                  i -> (cv.xq[i] - g.cq[i]) * (cv.xq[i] - g.cq[i]))) AS BIGINT) AS d
              FROM cv CROSS JOIN gc2 g
              WHERE cv.vec_id IN (0, 1024, 2048)) t)
        WHERE rn <= 2),
      cand AS (SELECT pr.q_id, ga3.vec_id FROM ga3 JOIN pr ON ga3.cluster = pr.cell
               WHERE ga3.vec_id <> pr.q_id),
      iad AS (SELECT pdt.q_id, paf.vec_id, CAST(SUM(pdt.d) AS BIGINT) AS adist
              FROM paf JOIN pdt ON paf.sub = pdt.sub AND paf.cluster = pdt.cluster
              JOIN cand ON cand.vec_id = paf.vec_id AND cand.q_id = pdt.q_id
              GROUP BY pdt.q_id, paf.vec_id),
      ${ragServeTail("iad")}"""),
    doc = "X89b: IVF-pruned RAG serving — coarse chunk cells prune the " +
      "candidate stream to nProbe/k of the corpus, ADC scores via the " +
      "broadcast LUT-frame join (no per-query plan literals), exact rerank " +
      "decides; nProbe=k degenerates to q202's flat scan (spec-pinned)")

  val all: Seq[Q] = Seq(q186, q190, q202, q206)
}
