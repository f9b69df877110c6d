package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Model.{Category, CategorySentiment, Entity, EntityCount, HoldsSentiment, Message, MessageCategories, MessageSentiment, Mood, Sentiment}
import graft.nlp.Lexicons
import graft.ops.ChatOps

/** A record with the reference's implicit arrival order (`seq`) and
  * processing time (`tsec`, seconds since stream epoch) made explicit —
  * the envelope every typed operator carries them through (SURVEY.md §1).
  */
case class Timed[A](seq: Long, tsec: Long, payload: A)

/**
 * The typed public facade of the engine: the reference program's generic
 * operator surface (`processChatStream` and friends,
 * SentimentAnalysis.scala:243-311) re-expressed over `Dataset[Timed[A]]`.
 *
 * A reference user's call sites port 1:1:
 *  - `processMessageStream(stream, timings)` (SentimentAnalysis.scala:289-291)
 *  - `processMoodStream(stream, keyExtractor, moodType, timings)`
 *    (SentimentAnalysis.scala:243-247), generic over `A <: HoldsSentiment`
 *  - `buildToxicityStream(stream, sampleSize, threshold)`
 *    (SentimentAnalysis.scala:304-311)
 *  - `getSentimentFromString(text)` (SentimentAnalysis.scala:231-240) —
 *    the deterministic local scorer standing in for the per-record RPC
 *
 * with the reference's `timings: (Int, Int)` dispatch preserved
 * (SentimentAnalysis.scala:281-286):
 *  - `(t1, 0), t1 > 0` → keyed tumbling window of t1 seconds
 *  - `(t1, t2), both > 0` → keyed sliding window, size t1 s, slide t2 s
 *  - anything else → keyed unwindowed running reduce, emitting the
 *    running aggregate once per input record
 *
 * Everything compiles to the same Catalyst plans the oracle-checked
 * DataFrame queries use ([[graft.pipeline.ParityQueries]]); sums run in
 * micro-unit integers internally and surface as the reference's `Float`
 * fields at the boundary. The reference's reducers `sys.error` on a
 * cross-key merge ("AGGREGATION PROBLEMS", SentimentAnalysis.scala:298);
 * here grouping is by key, so the mismatch case is unrepresentable.
 */
object ChatStreams {

  private val MICRO = 1000000.0

  /** X1 scalar twin (SentimentAnalysis.scala:231-240): lexicon scoring of
    * one string — score = Σv/(5·n) ∈ [−1,1], magnitude = Σ|v|/5 — the
    * same spec [[graft.nlp.NlpFunctions]] evaluates columnar. */
  private lazy val valenceMap: Map[String, Int] = Lexicons.valence.toMap

  def getSentimentFromString(text: String): Sentiment = {
    val toks = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
    var sv = 0; var sav = 0; var n = 0
    toks.foreach { t =>
      valenceMap.get(t).foreach { v =>
        sv += v; sav += math.abs(v); n += 1
      }
    }
    val score = if (n == 0) 0f else (sv / (5.0 * n)).toFloat
    Sentiment(score, (sav / 5.0).toFloat)
  }

  /** Window starts covering `tsec` for a (size, slide) sliding window —
    * every multiple s of `slide` with s ≤ tsec < s + size (matches the
    * native `window()` assignment for an epoch-aligned stream; leading
    * windows may start below 0). */
  private def slidingStarts(tsec: Column, size: Int, slide: Int): Column = {
    val last = tsec - pmod(tsec, lit(slide.toLong))
    filter(
      transform(sequence(lit(0L), lit(((size - 1) / slide).toLong)),
        k => last - k * slide),
      s => s > tsec - size)
  }

  /** One window-start column per record under the reference's timings
    * dispatch; `null` marks the running (unwindowed) case. */
  private def windowed(df: DataFrame, timings: (Int, Int)): DataFrame =
    timings match {
      case (t1, 0) if t1 > 0 =>
        df.withColumn("wsec", ChatOps.tumble(col("tsec"), t1))
      case (t1, t2) if t1 > 0 && t2 > 0 =>
        df.withColumn("wsec",
          explode(slidingStarts(col("tsec"), t1, t2)))
      case _ => df
    }

  /** `processMessageStream` (SentimentAnalysis.scala:289-302): keyBy
    * (channel, user) → window per `timings` → text concat with "\n" in
    * firing order (the order-sensitive messageReduce fold). The fold
    * order is the composite (tsec, seq): for raw messages tsec is
    * constant within a 1 s window so arrival `seq` decides, and for
    * CHAINED calls (`processMessageStream(parsedStream, (100, 0))`, the
    * reference's aggregateStream) the carried tsec is the inner window's
    * start — its firing order — so out-of-order arrivals still concat in
    * window-time order, exactly like [[graft.pipeline.ParityQueries.w2]].
    * Returns one merged message per fired window — per input record in
    * running mode — re-enveloped so calls chain. */
  def processMessageStream(ds: Dataset[Timed[Message]],
      timings: (Int, Int)): Dataset[Timed[Message]] = {
    import ds.sparkSession.implicits._
    val flat = ds.toDF().select(col("seq"), col("tsec"),
      col("payload.channel").as("channel"), col("payload.user").as("user"),
      col("payload.text").as("text"))
    val foldOrder = struct(col("tsec"), col("seq"))
    val merged = timings match {
      case (t1, t2) if t1 > 0 && (t2 == 0 || t2 > 0) =>
        windowed(flat, timings)
          .groupBy(col("wsec"), col("channel"), col("user"))
          .agg(min(col("seq")).as("seq"),
            ChatOps.orderedConcat(foldOrder, col("text")).as("text"))
          .select(col("seq"), col("wsec").as("tsec"), col("channel"),
            col("user"), col("text"))
      case _ =>
        // Running concat: the fold's cumulative state after each record.
        val w = Window.partitionBy(col("channel"), col("user"))
          .orderBy(col("tsec"), col("seq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        flat.withColumn("text",
          array_join(transform(
            array_sort(collect_list(struct(foldOrder.as("o"),
              col("text").as("t"))).over(w)),
            x => x.getField("t")), "\n"))
    }
    merged.select(col("seq"), col("tsec"),
      struct(col("channel"), col("user"), col("text")).as("payload"))
      .as[Timed[Message]]
  }

  /** R2 typed twin (SentimentAnalysis.scala:55-59): enrich each message
    * with its document sentiment — the reference's per-record map, with
    * the RPC replaced by the deterministic local scorer. (The columnar
    * path, [[graft.pipeline.ParityQueries.withSentiment]], computes the
    * same spec codegen'd; this typed form is the API-parity tier.) */
  def scoreMessages(ds: Dataset[Timed[Message]])
      : Dataset[Timed[MessageSentiment]] = {
    import ds.sparkSession.implicits._
    ds.map(r => Timed(r.seq, r.tsec,
      MessageSentiment(r.payload, getSentimentFromString(r.payload.text))))
  }

  private lazy val entitySet: Set[String] = Lexicons.entityTerms.toSet

  /** X2 scalar twin (SentimentAnalysis.scala:62-93): the entity records
    * of one scored text — mentions are lowercased capitalized tokens of
    * the ORIGINAL text plus lexicon-NER tokens; one Entity per distinct
    * key (sorted), salience = its mention share, sentiment = the
    * document's. The same spec [[graft.pipeline.ParityQueries.entityRows]]
    * evaluates columnar. */
  def getEntitiesFromString(text: String,
      sentiment: Sentiment): List[Entity] = {
    val caps = "[A-Z][a-z]+".r.findAllIn(text).map(_.toLowerCase).toList
    val ner = "[a-z]+".r.findAllIn(text.toLowerCase)
      .filter(entitySet.contains).toList
    val mentions = caps ++ ner
    val tot = mentions.size
    mentions.groupBy(identity).toList.sortBy(_._1).map { case (k, ms) =>
      Entity(k, (ms.size.toDouble / tot).toFloat, sentiment)
    }
  }

  /** entityStream (SentimentAnalysis.scala:62-93): flatten each scored
    * message into its entity records, envelope carried through so calls
    * chain (e.g. into `processMoodStream[Entity](_, _.key, "TOPIC", ...)`,
    * the reference's topic-opinion chain). */
  def entityStream(ds: Dataset[Timed[MessageSentiment]])
      : Dataset[Timed[Entity]] = {
    import ds.sparkSession.implicits._
    ds.flatMap(r =>
      getEntitiesFromString(r.payload.message.text, r.payload.sentiment)
        .map(e => Timed(r.seq, r.tsec, e)))
  }

  /** topicStream (SentimentAnalysis.scala:95-104): per-entity record
    * counts under the same timings dispatch — tumbling/sliding windowed
    * counts, or a per-record running count. Default `(10, 0)` is the
    * reference's 10 s tumble (W3). */
  def topicStream(ds: Dataset[Timed[Entity]],
      timings: (Int, Int) = (10, 0)): Dataset[Timed[EntityCount]] = {
    import ds.sparkSession.implicits._
    val flat = ds.toDF().select(col("seq"), col("tsec"),
      col("payload.key").as("key"))
    val agged = timings match {
      case (t1, t2) if t1 > 0 && (t2 == 0 || t2 > 0) =>
        windowed(flat, timings)
          .groupBy(col("wsec"), col("key"))
          .agg(min(col("seq")).as("seq"),
            count(lit(1)).cast("int").as("count"))
          .select(col("seq"), col("wsec").as("tsec"), col("key"),
            col("count"))
      case _ =>
        flat.withColumn("count",
          count(lit(1)).over(Window.partitionBy(col("key"))
            .orderBy(col("tsec"), col("seq"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("int"))
    }
    agged.select(col("seq"), col("tsec"),
      struct(col("key"), col("count")).as("payload"))
      .as[Timed[EntityCount]]
  }

  /** The reference's ≥25-word classification guard
    * (SentimentAnalysis.scala:129): Java `split(" ")` semantics — drops
    * trailing empty fields, `""` counts 1 — via Java split itself. */
  private def refWords(text: String): Int = text.split(" ").length

  /** X3 scalar twin (SentimentAnalysis.scala:126-148): keyword-hit
    * classification of one text; confidence = hits / |letter-run tokens|.
    * Guard is the CALLER's (under-guard messages keep an empty list,
    * exactly like the reference). */
  def getCategoriesFromString(text: String): List[Category] = {
    val toks = "[a-z]+".r.findAllIn(text.toLowerCase).toList
    val n = toks.size
    Lexicons.categoryKeywords.toList.flatMap { case (name, kws) =>
      val kwSet = kws.toSet
      val hits = toks.count(kwSet.contains)
      if (hits > 0) Some(Category(name, (hits.toDouble / n).toFloat))
      else None
    }
  }

  /** classifyMessageStream (SentimentAnalysis.scala:126-148): each
    * message with its category list — EMPTY (not dropped) when the text
    * fails the 25-word guard, exactly like the reference's map. */
  def classifyMessageStream(ds: Dataset[Timed[Message]])
      : Dataset[Timed[MessageCategories]] = {
    import ds.sparkSession.implicits._
    ds.map(r => Timed(r.seq, r.tsec, MessageCategories(r.payload,
      if (refWords(r.payload.text) >= 25)
        getCategoriesFromString(r.payload.text)
      else Nil)))
  }

  /** categorySentimentStream (SentimentAnalysis.scala:151-160): one
    * record per (message, category) pairing the classification with the
    * document sentiment — chains into
    * `processMoodStream[CategorySentiment]` (the reference's W6 opinion
    * stream). */
  def categorySentimentStream(ds: Dataset[Timed[MessageSentiment]])
      : Dataset[Timed[CategorySentiment]] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val text = r.payload.message.text
      val cats =
        if (refWords(text) >= 25) getCategoriesFromString(text) else Nil
      cats.map(c => Timed(r.seq, r.tsec,
        CategorySentiment(r.payload.message, c, r.payload.sentiment)))
    }
  }

  /** `processMoodStream` (SentimentAnalysis.scala:243-247), generic over
    * `A <: HoldsSentiment` exactly like the reference: project each record
    * to `Mood(key, score × magnitude, moodType)` (SentimentAnalysis.scala:
    * 249-255), then keyed windowed/running sum per `timings`. The sum runs
    * in micro-unit integers (exact, order-independent) and surfaces as the
    * reference's `Float`. */
  def processMoodStream[A <: HoldsSentiment](ds: Dataset[Timed[A]],
      keyExtractor: A => String, moodType: String,
      timings: (Int, Int)): Dataset[Timed[Mood]] = {
    import ds.sparkSession.implicits._
    val moods = ds.map { r =>
      val s = r.payload.sentiment
      (r.seq, r.tsec, keyExtractor(r.payload),
        math.round(s.score.toDouble * s.magnitude.toDouble * MICRO))
    }.toDF("seq", "tsec", "key", "micro")
    val agged = timings match {
      case (t1, t2) if t1 > 0 && (t2 == 0 || t2 > 0) =>
        windowed(moods, timings)
          .groupBy(col("wsec"), col("key"))
          .agg(min(col("seq")).as("seq"), sum(col("micro")).as("micro"))
          .select(col("seq"), col("wsec").as("tsec"), col("key"),
            col("micro"))
      case _ =>
        moods.withColumn("micro",
          ChatOps.runningSum(col("micro"), Seq(col("key")), Seq(col("seq"))))
    }
    agged.select(col("seq"), col("tsec"),
      struct(col("key"),
        (col("micro").cast("double") / lit(MICRO)).cast("float")
          .as("value"),
        lit(moodType).as("moodType")).as("payload"))
      .as[Timed[Mood]]
  }

  /** `buildToxicityStream` (SentimentAnalysis.scala:304-311): per
    * (key, moodType), tumbling count window of `sampleSize` records (by
    * arrival `seq`), summed; only complete windows fire; keep sums ≤
    * `threshold` (the reference's `<=`, SentimentAnalysis.scala:311).
    * Output value is the fired window's sum; `seq`/`tsec` index the
    * fired window.
    *
    * Precision note: this tier carries the reference's `Float` mood
    * values, so sums agree with the micro-exact oracle tier
    * ([[graft.pipeline.ParityQueries.w8ToxicUser]]) only to float32
    * precision — a window whose exact sum sits within that error of the
    * threshold can fire in one tier and not the other. */
  def buildToxicityStream(ds: Dataset[Timed[Mood]], sampleSize: Int,
      threshold: Float): Dataset[Timed[Mood]] = {
    import ds.sparkSession.implicits._
    val flat = ds.toDF().select(col("seq"),
      col("payload.key").as("key"),
      col("payload.moodType").as("moodType"),
      round(col("payload.value").cast("double") * lit(MICRO)).cast("long")
        .as("micro"))
    val rn = row_number().over(
      Window.partitionBy(col("key"), col("moodType")).orderBy(col("seq")))
    flat.withColumn("rn", rn)
      .withColumn("grp", expr(s"(rn - 1) div $sampleSize"))
      .groupBy(col("key"), col("moodType"), col("grp"))
      .agg(sum(col("micro")).as("micro"), count(lit(1)).as("cnt"))
      .where(col("cnt") === sampleSize &&
        col("micro") <= math.round(threshold.toDouble * MICRO))
      .select(col("grp").as("seq"), col("grp").as("tsec"),
        struct(col("key"),
          (col("micro").cast("double") / lit(MICRO)).cast("float")
            .as("value"),
          col("moodType")).as("payload"))
      .as[Timed[Mood]]
  }
}
