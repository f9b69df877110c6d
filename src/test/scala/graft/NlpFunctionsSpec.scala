package graft

import org.apache.spark.sql.functions._

import graft.nlp.NlpFunctions._

/** Unit coverage of the deterministic NLP scorers (SURVEY.md §2.5):
  * exact micro-unit scores, the ≥25-word classification guard boundary
  * (reference SentimentAnalysis.scala:129), entity mention extraction and
  * category confidence. Lexicon facts used: good=3, bad=-3 (Lexicons). */
class NlpFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def scored(text: String): (Long, Long, Long) = {
    val df = Seq(text).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .select(
        scoreMicro(valenceSum(col("toks")), matchedCount(col("toks")))
          .as("s"),
        magnitudeMicro(absValenceSum(col("toks"))).as("m"),
        moodMicro(valenceSum(col("toks")), absValenceSum(col("toks")),
          matchedCount(col("toks"))).as("v"))
    val r = df.head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("tokens lowercases and splits on non-letter runs, dropping empties") {
    val df = Seq("Hello, World!!  42 foo-bar").toDF("text")
      .select(tokens(col("text")).as("t"))
    assert(df.as[Seq[String]].head() ==
      Seq("hello", "world", "foo", "bar"))
  }

  test("score/magnitude/mood of a single positive word (good=3)") {
    // score = 3/(5*1) = 0.6; magnitude = 3/5 = 0.6; mood = 0.36
    assert(scored("good") == (600000L, 600000L, 360000L))
  }

  test("balanced words cancel score but not magnitude (good+bad)") {
    // sv=0, sav=6, n=2: score=0, magnitude=1.2, mood=0
    assert(scored("good bad") == (0L, 1200000L, 0L))
  }

  test("unlexiconed text scores zero everywhere") {
    assert(scored("zzz qqq xyzzy") == (0L, 0L, 0L))
  }

  test("empty text scores zero everywhere") {
    assert(scored("") == (0L, 0L, 0L))
  }

  test("refWordCount reproduces Java split-on-space semantics exactly") {
    val df = Seq(
      "one two three", // 3
      "a  b",          // double space: interior empty field KEPT -> 3
      "trailing ",     // trailing empties DROPPED -> 1
      "t  ",           // -> 1
      "",              // Java "".split(" ") == [""] -> 1
      "   ",           // all spaces: every field empty, all dropped -> 0
      "a \n",          // $ would strip before the \n; \z must not -> 2
    ).toDF("text").select(refWordCount(col("text")).as("n"))
    val expected = Seq("one two three", "a  b", "trailing ", "t  ", "", "   ",
      "a \n").map(_.split(" ").length)
    assert(expected == Seq(3, 3, 1, 1, 1, 0, 2)) // pin the JVM ground truth
    assert(df.as[Int].collect().toSeq == expected)
  }

  test("25-word guard boundary: 24 words blocked, 25 words pass") {
    val w24 = (1 to 24).map(i => s"w$i").mkString(" ")
    val w25 = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq(w24, w25).toDF("text")
      .select((refWordCount(col("text")) >= 25).as("pass"))
    assert(df.as[Boolean].collect().toSeq == Seq(false, true))
  }

  test("entityMentions finds capitalized tokens and lexicon entities") {
    val df = Seq("Alice met Bob near the spark cluster")
      .toDF("text")
      .select(entityMentions(col("text"), tokens(col("text"))).as("m"))
    // capitalized: alice, bob; lexicon NER: spark (entityTerms)
    assert(df.as[Seq[String]].head().sorted == Seq("alice", "bob", "spark"))
  }

  test("categoriesArr reports per-category keyword-hit confidence") {
    // 'join join merge' -> joins category: 3 hits of 3 tokens = 1e6 conf;
    // no other category hits.
    val df = Seq("join join merge").toDF("text")
      .select(explode(categoriesArr(tokens(col("text")))).as("c"))
      .select(col("c.category"), col("c.conf_micro"))
    val got = df.as[(String, Long)].collect().toSeq
    assert(got == Seq(("joins", 1000000L)))
  }

  test("categoriesArr of keywordless text is empty, not null") {
    val df = Seq("zzz qqq").toDF("text")
      .select(size(categoriesArr(tokens(col("text")))).as("n"))
    assert(df.as[Int].head() == 0)
  }
}
