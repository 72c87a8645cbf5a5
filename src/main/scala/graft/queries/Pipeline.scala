package graft.queries

import org.apache.spark.sql.functions._
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

  val all: Seq[Q] = Seq(q186, q190)
}
