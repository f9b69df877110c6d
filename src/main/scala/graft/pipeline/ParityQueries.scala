package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.nlp.NlpFunctions._
import graft.ops.ChatOps._
import graft.sources.Messages

/**
 * Batch twins of every declared stream in the reference DAG
 * (SURVEY.md §2.3-2.4, SentimentAnalysis.scala:44-224), over the
 * deterministic message stream derived from `documents`
 * ([[graft.sources.Messages]]). Each public method is one driver-checked
 * query; the matching DuckDB SQL lives in [[graft.oracle.OracleSql]].
 *
 * All real-valued outputs are micro-unit BIGINTs (see
 * [[graft.nlp.NlpFunctions]]) and all timestamps are integer seconds
 * relative to the stream epoch — the determinism contract that lets the
 * oracle hash-compare results exactly.
 *
 * Scale shape: the whole family is built from ONE scan of `documents` →
 * one hash aggregation per window level → analytic windows partitioned by
 * low-cardinality keys. No driver-side loops, no UDFs; every expression is
 * codegen'd. At 100 TB the heavy stage is the W1 groupBy, which shuffles
 * on (tsec, channel, username) — a key whose cardinality grows linearly
 * with data, so it parallelizes across any executor count.
 */
object ParityQueries {

  /** Epoch of the derived stream: 2024-01-01T00:00:00Z (divisible by every
    * window width used: 1, 10, 30, 60, 100 s). */
  val BaseEpoch = 1704067200L

  // ---------------------------------------------------------------
  // Shared stream stages (each a lazily composed DataFrame)
  // ---------------------------------------------------------------

  /** W1 (SentimentAnalysis.scala:44-48): keyBy(channel,user) + 1 s tumbling
    * window + arrival-order text concat. */
  def w1(spark: SparkSession, sfDir: String): DataFrame =
    Messages.messages(spark, sfDir)
      .groupBy(tumble(col("tsec"), 1).as("wsec"), col("channel"),
        col("username"))
      .agg(orderedConcat(col("seq"), col("text")).as("text"))

  /** Adds sv/sav/n + score/magnitude/mood micro columns for `text`.
    * Public: the streaming forms ([[graft.streaming.StreamingOps]]) reuse
    * the exact same enrichment. The raw lexicon sums come from the fused
    * native expression ([[graft.functions.ValenceStatsExpr]]) — one array
    * pass and one lexicon probe per token instead of three — with
    * identical integer results to the composed `aggregate()` form. */
  def withSentiment(df: DataFrame): DataFrame = {
    val vs = graft.functions.ValenceStatsExpr.stats(
      df.sparkSession, tokens(col("text")))
    df.withColumn("vs", vs)
      .withColumn("sv", col("vs.sv"))
      .withColumn("sav", col("vs.sav"))
      .withColumn("n", col("vs.n"))
      .drop("vs")
      .withColumn("score_micro", scoreMicro(col("sv"), col("n")))
      .withColumn("mag_micro", magnitudeMicro(col("sav")))
      .withColumn("mood_micro", moodMicro(col("sv"), col("sav"), col("n")))
  }

  /** sentimentStream twin (SentimentAnalysis.scala:55-59). */
  def sentimented(spark: SparkSession, sfDir: String): DataFrame =
    withSentiment(w1(spark, sfDir))

  /** W2 (SentimentAnalysis.scala:51-52): 100 s re-window of W1 results,
    * ordered by the 1 s window start. */
  def w2(spark: SparkSession, sfDir: String): DataFrame =
    w1(spark, sfDir)
      .groupBy(tumble(col("wsec"), 100).as("w2sec"), col("channel"),
        col("username"))
      .agg(orderedConcat(col("wsec"), col("text")).as("text"))

  /** entityStream twin (SentimentAnalysis.scala:62-93): one row per
    * (W1 row, entity key) with salience + the document's sentiment.
    * Salience = mentions(key) / total mentions in the document. */
  def entityRows(spark: SparkSession, sfDir: String): DataFrame = {
    val s = sentimented(spark, sfDir)
    val ments =
      graft.functions.EntityMentionsExpr.mentions(spark, col("text"))
    s.select(col("wsec"), col("channel"), col("username"),
        col("score_micro"), col("mag_micro"), col("mood_micro"),
        explode(ments).as("key"))
      .groupBy(col("wsec"), col("channel"), col("username"), col("key"),
        col("score_micro"), col("mag_micro"), col("mood_micro"))
      .agg(count(lit(1)).as("m"))
      .withColumn("totm", sum(col("m")).over(
        Window.partitionBy(col("wsec"), col("channel"), col("username"))))
      .withColumn("salience_micro",
        round(col("m").cast("double") / col("totm").cast("double") *
          lit(MICRO)).cast("long"))
  }

  /** categorySentimentStream twin (SentimentAnalysis.scala:126-160): W2
    * text → ≥25-word guard → category keyword hits → one row per category
    * with confidence and the W2 document sentiment. */
  def categoryRows(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = withSentiment(w2(spark, sfDir))
    s2.where(refWordCount(col("text")) >= 25)
      .select(col("w2sec"), col("channel"), col("username"),
        col("score_micro"), col("mag_micro"), col("mood_micro"),
        explode(graft.functions.CategoryHitsExpr.cats(spark,
          tokens(col("text")))).as("c"))
      .select(col("w2sec"), col("channel"), col("username"),
        col("c.category").as("category"),
        col("c.conf_micro").as("conf_micro"),
        col("score_micro"), col("mag_micro"), col("mood_micro"))
  }

  /** userMoodStream twin (SentimentAnalysis.scala:162-168, running reduce
    * per SentimentAnalysis.scala:285): cumulative mood per user, one row
    * per input record. */
  def userMoodRunning(spark: SparkSession, sfDir: String): DataFrame =
    sentimented(spark, sfDir)
      .select(col("username").as("key"), col("wsec"), col("channel"),
        col("mood_micro"))
      .withColumn("run_micro",
        runningSum(col("mood_micro"), Seq(col("key")),
          Seq(col("wsec"), col("channel"))))
      .drop("mood_micro", "channel")

  // ---------------------------------------------------------------
  // Driver-checked queries (stable output column sets)
  // ---------------------------------------------------------------

  /** R1: wire-format parse with split-limit-3 semantics
    * (SentimentAnalysis.scala:45-48; text may contain commas). The
    * reference's Java `split(",")` drops TRAILING empty fields before the
    * `drop(2).mkString(",")` re-join — equivalent to stripping trailing
    * commas from the whole line first (interior empties survive). */
  def r1Parse(spark: SparkSession, sfDir: String): DataFrame = {
    val line = rtrim(col("line"), ",")
    val parts = split(line, ",", 3)
    Messages.wireLines(spark, sfDir).select(
      col("seq"),
      parts.getItem(0).as("channel"),
      parts.getItem(1).as("username"),
      coalesce(get(parts, lit(2)), lit("")).as("text"))
  }

  def w1Concat(spark: SparkSession, sfDir: String): DataFrame =
    w1(spark, sfDir)

  def w2Concat(spark: SparkSession, sfDir: String): DataFrame =
    w2(spark, sfDir)

  /** X1/R2 sentiment scoring of W1 messages. */
  def x1Sentiment(spark: SparkSession, sfDir: String): DataFrame =
    sentimented(spark, sfDir).select("wsec", "channel", "username",
      "score_micro", "mag_micro")

  /** X2/R3 entity extraction with salience + per-document sentiment. */
  def x2Entities(spark: SparkSession, sfDir: String): DataFrame =
    entityRows(spark, sfDir).select("wsec", "channel", "username", "key",
      "salience_micro", "score_micro", "mag_micro")

  /** W3 topicStream (SentimentAnalysis.scala:95-104): entity-record count
    * per key per 10 s tumbling window. */
  def w3EntityCount(spark: SparkSession, sfDir: String): DataFrame =
    entityRows(spark, sfDir)
      .groupBy(tumble(col("wsec"), 10).as("w3sec"), col("key"))
      .agg(count(lit(1)).as("cnt"))

  /** The repaired trendingStream (SentimentAnalysis.scala:106-123, dead
    * code in the reference): per-window share of conversation per entity.
    */
  def trending(spark: SparkSession, sfDir: String): DataFrame =
    w3EntityCount(spark, sfDir)
      .withColumn("tot",
        sum(col("cnt")).over(Window.partitionBy(col("w3sec"))))
      .withColumn("pct_micro",
        round(col("cnt").cast("double") / col("tot").cast("double") *
          lit(MICRO)).cast("long"))
      .drop("tot")

  /** X3/R5 classification of W2 blocks (≥25-word guard). */
  def x3Categories(spark: SparkSession, sfDir: String): DataFrame =
    categoryRows(spark, sfDir).select("w2sec", "channel", "username",
      "category", "conf_micro")

  /** R6 CategorySentiment rows (SentimentAnalysis.scala:151-160). */
  def r6CategorySentiment(spark: SparkSession, sfDir: String): DataFrame =
    categoryRows(spark, sfDir).select("w2sec", "channel", "username",
      "category", "conf_micro", "score_micro", "mag_micro")

  /** R7 mood projection keyed by user (SentimentAnalysis.scala:162-168,
    * 249-255). */
  def r7MoodUser(spark: SparkSession, sfDir: String): DataFrame =
    sentimented(spark, sfDir).select(col("wsec"),
      col("username").as("key"), col("mood_micro"))

  /** W4 running user mood (SentimentAnalysis.scala:162-168 + :285). */
  def w4UserMoodRunning(spark: SparkSession, sfDir: String): DataFrame =
    userMoodRunning(spark, sfDir)

  /** W5 channelMoodStream (SentimentAnalysis.scala:170-176): sliding
    * 90 s / 60 s sum per channel. Built with the native event-time
    * `window()` over a real timestamp; output start is emitted as seconds
    * relative to the stream epoch. */
  def w5ChannelMoodSliding(spark: SparkSession, sfDir: String): DataFrame =
    sentimented(spark, sfDir)
      .withColumn("ts", timestamp_seconds(lit(BaseEpoch) + col("wsec")))
      .groupBy(window(col("ts"), "90 seconds", "60 seconds"),
        col("channel").as("key"))
      .agg(sum(col("mood_micro")).as("mood_micro"))
      .select(
        (unix_timestamp(col("window.start")) - BaseEpoch).as("wstart"),
        col("key"), col("mood_micro"))

  /** W6 categoryOpinionStream (SentimentAnalysis.scala:178-184): running
    * mood per category, ordered by (w2sec, channel, username). The key is
    * a FIXED 5-category taxonomy, so the plain analytic cumulative sum
    * would serialize each category's whole history onto one task at any
    * scale — this uses the two-phase chunked plan
    * ([[graft.ops.ChatOps.chunkedRunningSum]]): chunk partials + prefix
    * offsets, identical results, per-task work bounded by chunk width. */
  def w6CategoryOpinion(spark: SparkSession, sfDir: String): DataFrame =
    chunkedRunningSum(
      categoryRows(spark, sfDir)
        .select(col("category").as("key"), col("w2sec"), col("channel"),
          col("username"), col("mood_micro")),
      col("mood_micro"), Seq("key"),
      Seq(col("w2sec"), col("channel"), col("username")), "run_micro")
      .drop("mood_micro")

  /** W7 entityOpinionStream (SentimentAnalysis.scala:186-192): 30 s
    * tumbling mood sum per entity. */
  def w7EntityOpinion(spark: SparkSession, sfDir: String): DataFrame =
    entityRows(spark, sfDir)
      .groupBy(tumble(col("wsec"), 30).as("w7sec"), col("key"))
      .agg(sum(col("mood_micro")).as("mood_micro"))

  /** W8 toxicUserStream (SentimentAnalysis.scala:201-206): countWindow(10)
    * over the running user-mood emissions, sum ≤ −10. The value column
    * rides in the ORDER BY (mirrored in the oracle SQL) so that rows tied
    * on (key, wsec) — a user active in two channels in one second — fold
    * in a deterministic order; fully tied rows carry equal values and
    * cannot change any window sum. */
  def w8ToxicUser(spark: SparkSession, sfDir: String): DataFrame =
    countWindowSum(userMoodRunning(spark, sfDir), col("key"),
      Seq(col("wsec"), col("run_micro")), col("run_micro"), 10,
      -10L * 1000000L)

  /** W8 toxicTopicStream (SentimentAnalysis.scala:194-199): countWindow(25)
    * over 30 s entity-opinion emissions, sum ≤ −20. */
  def w8ToxicTopic(spark: SparkSession, sfDir: String): DataFrame =
    countWindowSum(w7EntityOpinion(spark, sfDir), col("key"),
      Seq(col("w7sec"), col("mood_micro")), col("mood_micro"), 25,
      -20L * 1000000L)

  /** W8 toxicChannelStream (SentimentAnalysis.scala:208-213): countWindow
    * (50) ≤ −30 — consuming **userMoodStream, not channelMoodStream**
    * (reference quirk at SentimentAnalysis.scala:210, preserved as spec).
    */
  def w8ToxicChannel(spark: SparkSession, sfDir: String): DataFrame =
    countWindowSum(userMoodRunning(spark, sfDir), col("key"),
      Seq(col("wsec"), col("run_micro")), col("run_micro"), 50,
      -30L * 1000000L)
}
