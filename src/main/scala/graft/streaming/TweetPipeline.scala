package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fixtures

/** The reference's core domain pipeline (E1/E2, SURVEY.md §3): ingest
  * tweet JSON → extract hashtags/geo → sentiment → standardized record.
  *
  * Evidence map (reference README.md): payload shape :79, hashtag regex
  * :81-83, geo "Space object" :84-86, sentiment :87-88, tokens :89-91,
  * standardized output :95-97. The pretrained Vivekn model is replaced
  * by the deterministic lexicon join (N3) — same capability class,
  * reproducible offline (SURVEY.md §7 "Deterministic NLP").
  *
  * `enrich` is ONE shared plan builder used by the batch file path (E2),
  * the streaming path, and the HTTP path (E1) — the Spark way to make
  * "batch and streaming compute the same thing" a structural guarantee
  * instead of a prose claim. Everything except the broadcast lexicon
  * join is a per-row projection: no shuffle, fully codegen'd, safe on an
  * unbounded stream.
  */
object TweetPipeline {

  /** Name of the malformed-input capture column (schema field, reader
    * option, and enrich passthrough all share it). */
  val CorruptCol = "_corrupt_record"

  private val baseOutputCols = Seq("created_at", "text", "user", "hashtags",
    "space", "sentiment_score", "sentiment", "n_tokens")

  /** Enriched output columns: malformed inputs stay visible downstream
    * (not silently all-null rows) whenever the input carries them. */
  private def outputCols(inputCols: Seq[String]): Seq[String] =
    if (inputCols.contains(CorruptCol)) baseOutputCols :+ CorruptCol
    else baseOutputCols

  /** Explicit schema (never inference — determinism; corrupt rows are
    * captured, not dropped). Reference README.md:79. */
  val tweetSchema: StructType = StructType(Seq(
    StructField("created_at", TimestampType),
    StructField("text", StringType),
    StructField("user", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType)))),
    StructField("geo", StructType(Seq(
      StructField("lat", DoubleType),
      StructField("lon", DoubleType)))),
    StructField(CorruptCol, StringType)))

  /** Shared enrichment: works identically on batch and streaming frames. */
  def enrich(tweets: DataFrame): DataFrame = {
    val tokens = split(lower(col("text")), "\\s+")
    // sentiment = Σ lexicon scores of tokens (N3). The fixture lexicon is
    // driver-side data, so it compiles to a literal map lookup — pure
    // per-row projection, stream-safe, no join. (A large lexicon would
    // use the broadcast-join form instead — q45 demonstrates it.)
    val lexMap = typedLit(Fixtures.sentimentLexicon.toMap)
    val scoreExpr = aggregate(
      tokens, lit(0),
      (acc, t) => acc + coalesce(try_element_at(lexMap, t), lit(0)))
    tweets
      .withColumn("hashtags", regexp_extract_all(col("text"), lit("#\\w+"), lit(0)))
      .withColumn("space",
        when(col("geo").isNotNull,
          struct(col("geo.lat").as("latitude"), col("geo.lon").as("longitude"))))
      .withColumn("tokens", tokens)
      .withColumn("n_tokens", size(tokens))
      .withColumn("sentiment_score", scoreExpr)
      .withColumn("sentiment",
        when(col("sentiment_score") > 0, "positive")
          .when(col("sentiment_score") < 0, "negative")
          .otherwise("neutral"))
      .select(outputCols(tweets.columns).map(col): _*)
  }

  /** E2 — batch file ingest (reference README.md:105-107). */
  def batchIngest(spark: SparkSession, path: String): DataFrame =
    enrich(spark.read.schema(tweetSchema)
      .option("columnNameOfCorruptRecord", CorruptCol).json(path))

  /** E1 streaming file ingest — same plan, readStream source.
    *
    * `maxFilesPerTrigger` (None = unthrottled) bounds how many NEW files
    * one micro-batch admits — the operational knob that keeps a backlog
    * burst (a producer dumping 10⁵ files after an outage, or the first
    * start against months of history) from becoming one giant
    * micro-batch that blows executor memory and holds the checkpoint
    * hostage for hours. Recovery drains the backlog as a SEQUENCE of
    * bounded batches instead, each committing its own offsets — steady
    * forward progress, bounded state, and `Trigger.AvailableNow` still
    * terminates after the backlog (unlike legacy `Trigger.Once`, which
    * ignores source rate limits and swallows everything in one batch).
    * StreamingSpec pins the bound: a file burst under this knob never
    * admits more than the configured files' rows in any micro-batch. */
  def streamIngest(spark: SparkSession, path: String,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(tweetSchema)
      .option("columnNameOfCorruptRecord", CorruptCol)
    val throttled = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
    enrich(throttled.json(path))
  }

  /** Parse a column of raw JSON strings (the HTTP body path, E1). */
  def parseJson(raw: DataFrame, jsonCol: String): DataFrame =
    enrich(raw
      .select(from_json(col(jsonCol), tweetSchema).as("t"))
      .select("t.*"))
}
