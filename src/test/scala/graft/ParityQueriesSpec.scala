package graft

import org.apache.spark.sql.functions._

import graft.pipeline.ParityQueries
import graft.sources.Messages

/** Pipeline-level invariants over the sf0.001 fixture plus the reference
  * quirks that must be preserved as spec (SURVEY.md §5). */
class ParityQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("r1Parse keeps commas inside the text body (split-limit-3)") {
    val row = ParityQueries.r1Parse(spark, sf)
      .where(col("text").contains(","))
    // The fixture injects ', the ' into texts; limit-3 split must keep it.
    assert(row.count() > 0)
    val r = row.select("channel", "username").head()
    assert(r.getString(0).startsWith("ch") && r.getString(1).startsWith("u"))
  }

  test("w1 fold concatenates whole bucket texts in arrival order") {
    val w1 = ParityQueries.w1(spark, sf)
    // Every full bucket carries 3 docs joined by \n.
    val nl = w1.select(
      (size(split(col("text"), "\n", -1))).as("n"))
    assert(nl.agg(max(col("n"))).as[Int].head() == 3)
  }

  test("toxicChannel consumes userMood, not channelMood (reference quirk)") {
    // Reference SentimentAnalysis.scala:210 wires toxicChannelStream to
    // userMoodStream; keys must therefore be user keys, not channels.
    val keys = ParityQueries.w8ToxicChannel(spark, sf)
      .select("key").distinct().as[String].collect()
    assert(keys.nonEmpty)
    assert(keys.forall(_.startsWith("u")), s"expected user keys, got ${keys.toSeq}")
  }

  test("toxicity operators fire non-vacuously on the fixture") {
    assert(ParityQueries.w8ToxicUser(spark, sf).count() > 0)
    assert(ParityQueries.w8ToxicTopic(spark, sf).count() > 0)
    assert(ParityQueries.w8ToxicChannel(spark, sf).count() > 0)
  }

  test("windowed sum equals sum of window sums (w7 vs entity total)") {
    val w7tot = ParityQueries.w7EntityOpinion(spark, sf)
      .groupBy("key").agg(sum("mood_micro").as("t"))
    val enttot = ParityQueries.entityRows(spark, sf)
      .groupBy("key").agg(sum("mood_micro").as("t"))
    assert(w7tot.join(enttot, "key")
      .where(w7tot("t") =!= enttot("t")).count() == 0)
  }

  test("trending percentages sum to ~100% per window") {
    val sums = ParityQueries.trending(spark, sf)
      .groupBy("w3sec").agg(sum("pct_micro").as("s"))
      .select("s").as[Long].collect()
    // rounding leaves at most |entities| * 0.5 micro drift per window
    assert(sums.forall(s => math.abs(s - 1000000L) < 50L),
      s"bad pct sums: ${sums.take(5).toSeq}")
  }

  test("salience sums to ~1e6 per document (x2)") {
    val sums = ParityQueries.x2Entities(spark, sf)
      .groupBy("wsec", "channel", "username")
      .agg(sum("salience_micro").as("s"))
      .select("s").as[Long].collect()
    assert(sums.forall(s => math.abs(s - 1000000L) < 50L))
  }

  test("running user mood final value equals the user's total mood") {
    val last = ParityQueries.w4UserMoodRunning(spark, sf)
      .groupBy("key").agg(max_by(col("run_micro"), col("wsec")).as("fin"))
    val tot = ParityQueries.r7MoodUser(spark, sf)
      .groupBy("key").agg(sum("mood_micro").as("t"))
    assert(last.join(tot, "key")
      .where(col("fin") =!= col("t")).count() == 0)
  }

  test("user cardinality scales with document count in the derivation") {
    def users(nDocs: Int) = {
      val docs = (0 until nDocs).map(i => (i.toLong, "x")).toDF("doc_id", "text")
      Messages.fromDocs(docs).select("username").distinct().count()
    }
    assert(users(300) == 3)     // floor of 3 users at tiny scale
    assert(users(20000) == 104) // 6667 buckets -> 104 users
  }
}
