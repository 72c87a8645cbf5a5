package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Q
import graft.streaming.TweetPipeline

/** The reference's flagship loop, END TO END (r8 verdict item 1): tweet
  * JSON files → schema'd ingest → the full enrichment (hashtags, geo,
  * sentiment, tokens) → standardized record → the three E3 query
  * shapes users actually run (by hashtag, by sentiment class, by
  * user), hash-matched as ONE composed oracle query.
  *
  * Evidence map (reference README.md): payload shape :79, hashtag
  * extraction :81-83, geo "Space object" :84-86, sentiment :87-88,
  * tokens :89-91, standardized output :95-97, the query surface
  * :98-104. Every stage was already oracle-checked piecewise (q37,
  * q42, q45-q47, q60) and E1==E2 equality is pinned in StreamingSpec —
  * but stage composition has its own failure modes only an end-to-end
  * hash catches (the q186/q202 thesis, applied to the reference's own
  * product): a schema drift between the writer and `tweetSchema`, a
  * lowercase/tokenize ordering swap, a timestamp that doesn't survive
  * the JSON roundtrip — each would pass every per-stage oracle and
  * still corrupt the composed answer.
  *
  * The fixture is DERIVED from the corpus, not invented: each
  * `documents` row becomes one tweet (deterministic epoch-minute
  * timestamp, '#'+source hashtag — every third doc gets a second
  * '#'+lang tag — a 16-user ring, and a geo point present on 4 of 5
  * docs), serialized to REAL JSON files by the Spark writer and read
  * back through [[TweetPipeline.batchIngest]] — the reference's E2
  * file path, exercising serialize → parse → enrich, not just enrich.
  * The DuckDB twin recomputes the same algebra straight off the
  * documents parquet, so the hash also certifies the JSON roundtrip
  * (incl. the timestamp, via the epoch-sum shape below).
  *
  * Scale: the enrichment is a pure per-row projection (the broadcast-
  * free literal-map sentiment lookup — TweetPipeline scaladoc), so the
  * only shuffles are the four presentation aggregates; at 100 TB the
  * same plan reads a partitioned JSON/Kafka landing zone instead of
  * one scratch dir, unchanged.
  */
object Tweets {

  /** One deterministic tweet per documents row (the reference's
    * README.md:79 payload, populated from corpus columns). */
  def tweetFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Tables(s, dir, "documents")
      .filter($"text".isNotNull)
      .select(
        timestamp_seconds(lit(1704067200L) + $"doc_id" * 60L).as("created_at"),
        concat($"text", lit(" #"), $"source",
          when($"doc_id" % 3 === 0, concat(lit(" #"), $"lang"))
            .otherwise(lit(""))).as("text"),
        struct(($"doc_id" % 16).as("id"),
          concat(lit("u"), $"doc_id" % 16).as("name")).as("user"),
        when($"doc_id" % 5 =!= 0,
          struct(($"doc_id" % 90).cast("double").as("lat"),
            ($"doc_id" % 180).cast("double").as("lon"))).as("geo"))
  }

  /** The E3 query surface over the standardized record, as one frame:
    * (kind, key, n, m) — by hashtag (m = Σ sentiment score), by
    * sentiment class (m = Σ token count), by user (m = positive-tweet
    * count), geo presence (m = Σ integer latitude), and the
    * timestamp-roundtrip pin (m = Σ epoch seconds). Shared by q205 and
    * the StreamingSpec E1==E2==q205 equality. */
  def e3Shapes(enr: DataFrame): DataFrame = {
    import enr.sparkSession.implicits._
    val byTag = enr.select(explode($"hashtags").as("key"), $"sentiment_score")
      .groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"sentiment_score").as("m"))
      .select(lit("hashtag").as("kind"), $"key", $"n", $"m")
    val bySent = enr.groupBy($"sentiment".as("key"))
      .agg(count(lit(1)).as("n"), sum($"n_tokens").cast("long").as("m"))
      .select(lit("sentiment").as("kind"), $"key", $"n", $"m")
    val byUser = enr.select($"user.name".as("key"),
        when($"sentiment" === "positive", 1L).otherwise(0L).as("pos"))
      .groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"pos").as("m"))
      .select(lit("user").as("kind"), $"key", $"n", $"m")
    val byGeo = enr.select(
        when($"space".isNotNull, "geo").otherwise("nogeo").as("key"),
        coalesce($"space.latitude".cast("long"), lit(0L)).as("lat"))
      .groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"lat").as("m"))
      .select(lit("geo").as("kind"), $"key", $"n", $"m")
    val byTime = enr.agg(count(lit(1)).as("n"),
        sum(unix_timestamp($"created_at")).as("m"))
      .select(lit("time").as("kind"), lit("epoch_sum").as("key"), $"n", $"m")
    byTag.unionByName(bySent).unionByName(byUser)
      .unionByName(byGeo).unionByName(byTime)
      .orderBy($"kind", $"key")
  }

  val q205 = Q(
    "q205_tweet_enrich_pipeline",
    (s, dir) => {
      val out = Sources.scratch("tweets")
      tweetFrame(s, dir).write.mode("overwrite").json(out)
      e3Shapes(TweetPipeline.batchIngest(s, out))
    },
    Some("""
      WITH tw AS (
        SELECT doc_id,
               text || ' #' || source ||
                 CASE WHEN doc_id % 3 = 0 THEN ' #' || lang ELSE '' END AS ttext,
               'u' || CAST(doc_id % 16 AS VARCHAR) AS uname,
               CASE WHEN doc_id % 5 <> 0 THEN CAST(doc_id % 90 AS BIGINT) END AS lat,
               1704067200 + doc_id * 60 AS epoch
        FROM documents WHERE text IS NOT NULL),
      tok AS (SELECT doc_id, unnest(string_split_regex(lower(ttext), '\s+')) AS t
              FROM tw),
      sent AS (SELECT tok.doc_id,
                 CAST(COALESCE(SUM(lex.score), 0) AS BIGINT) AS score,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
               FROM tok LEFT JOIN (VALUES ('fast', 3), ('merge', 2), ('big', 1),
                   ('value', 1), ('slow', -3), ('dup', -2), ('small', -1),
                   ('scan', -1)) lex(term, score) ON tok.t = lex.term
               GROUP BY tok.doc_id),
      rec AS (SELECT tw.doc_id, tw.ttext, tw.uname, tw.lat, tw.epoch,
                sent.score, sent.n_tokens,
                CASE WHEN sent.score > 0 THEN 'positive'
                     WHEN sent.score < 0 THEN 'negative'
                     ELSE 'neutral' END AS sentiment
              FROM tw JOIN sent ON tw.doc_id = sent.doc_id),
      tags AS (SELECT doc_id, unnest(regexp_extract_all(ttext, '#\w+')) AS tag
               FROM rec),
      s1 AS (SELECT 'hashtag' AS kind, tags.tag AS key,
               CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rec.score) AS BIGINT) AS m
             FROM tags JOIN rec ON tags.doc_id = rec.doc_id GROUP BY tags.tag),
      s2 AS (SELECT 'sentiment' AS kind, sentiment AS key,
               CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_tokens) AS BIGINT) AS m
             FROM rec GROUP BY sentiment),
      s3 AS (SELECT 'user' AS kind, uname AS key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN sentiment = 'positive' THEN 1 ELSE 0 END)
                 AS BIGINT) AS m
             FROM rec GROUP BY uname),
      s4 AS (SELECT 'geo' AS kind,
               CASE WHEN lat IS NOT NULL THEN 'geo' ELSE 'nogeo' END AS key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COALESCE(lat, 0)) AS BIGINT) AS m
             FROM rec GROUP BY 2),
      s5 AS (SELECT 'time' AS kind, 'epoch_sum' AS key,
               CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(epoch) AS BIGINT) AS m
             FROM rec)
      SELECT * FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
        UNION ALL SELECT * FROM s5)
      ORDER BY kind, key"""),
    doc = "E1-E3 composed: the reference's flagship tweet pipeline end to " +
      "end — corpus-derived tweet JSON files -> schema'd ingest -> " +
      "hashtag/geo/sentiment/token enrichment -> query by hashtag / " +
      "sentiment / user / geo / epoch, one hash over the whole loop")

  val all: Seq[Q] = Seq(q205)
}
