package graft

import org.apache.spark.sql.functions._

import graft.api.{ChatStreams, Timed}
import graft.model.Model.{Message, MessageSentiment, Mood}
import graft.pipeline.ParityQueries
import graft.sources.Messages

/** The typed facade ([[graft.api.ChatStreams]]) must produce the same
  * results as the oracle-checked DataFrame queries it mirrors — the
  * reference user's port path is `processMessageStream`/`processMoodStream`
  * /`buildToxicityStream` with the reference's own timings tuples
  * (SentimentAnalysis.scala:44-52, 162-168, 201-206).
  *
  * The typed surface carries the reference's `Float` sentiment fields, so
  * value comparisons allow a small float32 tolerance against the
  * micro-exact parity queries, and toxicity-window firing agrees with the
  * exact tier only when no window sum sits within float32 error of the
  * threshold (true on this fixture; see buildToxicityStream's precision
  * note). Keys and time-window membership are exact. */
class ChatStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private lazy val typedMessages =
    Messages.messages(spark, SF)
      .select(col("seq"), col("tsec"), col("channel"),
        col("username").as("user"), col("text"))
      .as[(Long, Long, String, String, String)]
      .map(r => Timed(r._1, r._2, Message(r._3, r._4, r._5)))

  private lazy val w1Typed = ChatStreams.processMessageStream(
    typedMessages, (1, 0))

  test("typed processMessageStream (1,0) equals the W1 parity query") {
    val typed = w1Typed
      .map(t => (t.tsec, t.payload.channel, t.payload.user, t.payload.text))
      .collect().toSeq.sorted
    val parity = ParityQueries.w1(spark, SF)
      .select("wsec", "channel", "username", "text")
      .as[(Long, String, String, String)].collect().toSeq.sorted
    assert(typed == parity)
  }

  test("typed calls chain: (1,0) then (100,0) equals the W2 parity query") {
    val typed = ChatStreams.processMessageStream(w1Typed, (100, 0))
      .map(t => (t.tsec, t.payload.channel, t.payload.user, t.payload.text))
      .collect().toSeq.sorted
    val parity = ParityQueries.w2(spark, SF)
      .select("w2sec", "channel", "username", "text")
      .as[(Long, String, String, String)].collect().toSeq.sorted
    assert(typed == parity)
  }

  test("typed running mood keyed by user tracks the W4 parity query") {
    val typed = ChatStreams.processMoodStream[MessageSentiment](
        ChatStreams.scoreMessages(w1Typed),
        _.message.user, "USER", (0, 0))
      .map(t => ((t.payload.key, t.tsec), t.payload.value))
      .collect().toMap
    val parity = ParityQueries.w4UserMoodRunning(spark, SF)
      .select(col("key"), col("wsec"), col("run_micro"))
      .as[(String, Long, Long)].collect()
      .map { case (k, w, m) => ((k, w), m / 1e6) }.toMap
    assert(typed.keySet == parity.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - parity(k)) < 1e-3,
        s"$k: typed $v vs parity ${parity(k)}")
    }
  }

  test("typed sliding mood (90,60) keyed by channel tracks W5 parity") {
    val typed = ChatStreams.processMoodStream[MessageSentiment](
        ChatStreams.scoreMessages(w1Typed),
        _.message.channel, "CHANNEL", (90, 60))
      .map(t => ((t.payload.key, t.tsec), t.payload.value))
      .collect().toMap
    val parity = ParityQueries.w5ChannelMoodSliding(spark, SF)
      .select(col("key"), col("wstart"), col("mood_micro"))
      .as[(String, Long, Long)].collect()
      .map { case (k, w, m) => ((k, w), m / 1e6) }.toMap
    assert(typed.keySet == parity.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - parity(k)) < 1e-3,
        s"$k: typed $v vs parity ${parity(k)}")
    }
  }

  test("typed toxicity stream fires the same windows as W8 toxicUser") {
    val moods = ChatStreams.processMoodStream[MessageSentiment](
      ChatStreams.scoreMessages(w1Typed), _.message.user, "USER", (0, 0))
    val typed = ChatStreams.buildToxicityStream(moods, 10, -10f)
      .map(t => ((t.payload.key, t.seq), t.payload.value))
      .collect().toMap
    val parity = ParityQueries.w8ToxicUser(spark, SF)
      .select(col("key"), col("grp"), col("mood_micro"))
      .as[(String, Long, Long)].collect()
      .map { case (k, g, m) => ((k, g), m / 1e6) }.toMap
    assert(typed.keySet == parity.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - parity(k)) < 1e-2,
        s"$k: typed $v vs parity ${parity(k)}")
    }
  }

  test("typed entityStream flattens the same entity records as X2") {
    val typed = ChatStreams.entityStream(ChatStreams.scoreMessages(w1Typed))
      .map(t => ((t.tsec, t.payload.key), t.payload.salience.toDouble))
      .collect().toSeq.sortBy(r => (r._1, r._2))
    val parity = ParityQueries.x2Entities(spark, SF)
      .select("wsec", "key", "salience_micro")
      .as[(Long, String, Long)].collect()
      .map { case (w, k, m) => ((w, k), m / 1e6) }
      .toSeq.sortBy(r => (r._1, r._2))
    assert(typed.map(_._1) == parity.map(_._1))
    typed.zip(parity).foreach { case ((k, a), (_, b)) =>
      assert(math.abs(a - b) < 2e-3, s"$k: typed $a vs parity $b")
    }
  }

  test("typed entity chain into processMoodStream tracks W7 entity opinion") {
    // The reference's topic-opinion chain: entities flattened from scored
    // messages, then a 30 s keyed tumbling mood sum — generic
    // processMoodStream[Entity] because Entity <: HoldsSentiment.
    import graft.model.Model.Entity
    val typed = ChatStreams.processMoodStream[Entity](
        ChatStreams.entityStream(ChatStreams.scoreMessages(w1Typed)),
        _.key, "TOPIC", (30, 0))
      .map(t => ((t.tsec, t.payload.key), t.payload.value.toDouble))
      .collect().toMap
    val parity = ParityQueries.w7EntityOpinion(spark, SF)
      .select("w7sec", "key", "mood_micro")
      .as[(Long, String, Long)].collect()
      .map { case (w, k, m) => ((w, k), m / 1e6) }.toMap
    assert(typed.keySet == parity.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - parity(k)) < 1e-2,
        s"$k: typed $v vs parity ${parity(k)}")
    }
  }

  test("typed topicStream counts equal the W3 parity query exactly") {
    val typed = ChatStreams.topicStream(
        ChatStreams.entityStream(ChatStreams.scoreMessages(w1Typed)))
      .map(t => ((t.tsec, t.payload.key), t.payload.count.toLong))
      .collect().toMap
    val parity = ParityQueries.w3EntityCount(spark, SF)
      .select("w3sec", "key", "cnt")
      .as[(Long, String, Long)].collect()
      .map { case (w, k, c) => ((w, k), c) }.toMap
    assert(typed == parity) // integer counts: exact equality
  }

  test("typed category streams match X3 and keep the empty-list guard") {
    val w2Typed = ChatStreams.processMessageStream(w1Typed, (100, 0))
    val scored = ChatStreams.scoreMessages(w2Typed)
    val typed = ChatStreams.categorySentimentStream(scored)
      .map(t => ((t.tsec, t.payload.category.category),
        t.payload.category.confidence.toDouble))
      .collect().toSeq.sortBy(r => (r._1, r._2))
    val parity = ParityQueries.x3Categories(spark, SF)
      .select("w2sec", "category", "conf_micro")
      .as[(Long, String, Long)].collect()
      .map { case (w, c, m) => ((w, c), m / 1e6) }
      .toSeq.sortBy(r => (r._1, r._2))
    assert(typed.map(_._1) == parity.map(_._1))
    typed.zip(parity).foreach { case ((k, a), (_, b)) =>
      assert(math.abs(a - b) < 2e-3, s"$k: typed $a vs parity $b")
    }
    // classifyMessageStream keeps EVERY message; under-guard rows carry
    // an empty list (reference keeps the record, not the categories).
    val classified = ChatStreams.classifyMessageStream(w2Typed)
      .collect().toSeq
    assert(classified.size == w2Typed.count())
    val nonEmpty = classified.count(_.payload.categories.nonEmpty)
    val parityBlocks = ParityQueries.x3Categories(spark, SF)
      .select("w2sec", "channel", "username").distinct().count()
    assert(nonEmpty.toLong == parityBlocks)
  }

  test("scalar getSentimentFromString matches the columnar scorer") {
    val texts = Seq(
      "What a good great day",
      "bad terrible awful slow",
      "no lexicon words here xyz",
      "Good, bad. MIXED!  feelings",
      "")
    val scalar = texts.map(ChatStreams.getSentimentFromString)
    val columnar = ParityQueries.withSentiment(
        texts.toDF("text"))
      .select(col("score_micro"), col("mag_micro"))
      .as[(Long, Long)].collect()
    scalar.zip(columnar).foreach { case (s, (scoreM, magM)) =>
      assert(math.abs(s.score - scoreM / 1e6) < 2e-6)
      assert(math.abs(s.magnitude - magM / 1e6) < 2e-6)
    }
  }

  test("chained windows concat in window-time order for out-of-order input") {
    // arrival order (seq) disagrees with event time (tsec): the chained
    // re-window must fold by the inner windows' time, like the parity W2.
    val in = Seq(
      Timed(1L, 100L, Message("c", "u", "B")),
      Timed(2L, 0L, Message("c", "u", "A"))).toDS()
    val w1 = ChatStreams.processMessageStream(in, (1, 0))
    val out = ChatStreams.processMessageStream(w1, (200, 0))
      .map(_.payload.text).collect().toSeq
    assert(out == Seq("A\nB"))
  }

  test("toxicity count windows are tracked per (key, moodType)") {
    val moods = ((1 to 10).map(i =>
      Timed(i.toLong, i.toLong, Mood("k", -2f, "USER"))) ++
      (11 to 20).map(i =>
        Timed(i.toLong, i.toLong, Mood("k", -2f, "CHANNEL")))).toDS()
    val fired = ChatStreams.buildToxicityStream(moods, 10, -10f)
      .map(t => (t.payload.moodType, t.payload.value))
      .collect().toSeq.sorted
    assert(fired == Seq(("CHANNEL", -20f), ("USER", -20f)))
  }

  test("running messageReduce emits the cumulative concat per record") {
    val in = Seq(
      Timed(1L, 0L, Message("c", "u", "a")),
      Timed(2L, 1L, Message("c", "u", "b")),
      Timed(3L, 2L, Message("c", "u", "c")),
      Timed(4L, 0L, Message("c", "v", "x"))).toDS()
    val out = ChatStreams.processMessageStream(in, (0, 0))
      .map(t => (t.seq, t.payload.text)).collect().toMap
    assert(out == Map(1L -> "a", 2L -> "a\nb", 3L -> "a\nb\nc", 4L -> "x"))
  }
}
