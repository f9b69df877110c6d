package graft

import org.apache.spark.sql.functions._

import graft.functions.ValenceStatsExpr
import graft.nlp.NlpFunctions._

/** The fused native scorer ([[graft.functions.ValenceStatsExpr]]) must be
  * value-identical to the composed `aggregate()` form it replaces — on
  * fixture text, crafted edges, and under codegen. */
class ValenceStatsSpec extends SparkSpec {
  import spark.implicits._

  private def fused(textCol: String) =
    ValenceStatsExpr.stats(spark, tokens(col(textCol)))

  test("fused stats equal the composed aggregate form on crafted text") {
    val df = Seq(
      "good bad GREAT terrible-fast", // mixed valences, punctuation
      "no lexicon words here at all x",
      "",
      "good good good",               // repeated token
      "slow, slow. SLOW!").toDF("text")
    val toks = tokens(col("text"))
    val rows = df.select(
      fused("text").as("vs"),
      valenceSum(toks).as("sv"),
      absValenceSum(toks).as("sav"),
      matchedCount(toks).as("n"))
      .select(col("vs.sv"), col("vs.sav"), col("vs.n"),
        col("sv"), col("sav"), col("n"))
      .as[(Int, Int, Int, Int, Int, Int)].collect()
    rows.foreach { case (a1, a2, a3, b1, b2, b3) =>
      assert((a1, a2, a3) == ((b1, b2, b3)))
    }
    // pin absolute values of the first row: good(3) bad(-3) great(3)
    // terrible(-3) fast(3)
    assert(rows(0)._1 == 3 && rows(0)._2 == 15 && rows(0)._3 == 5)
  }

  test("fused stats equal the composed form across the sf0.001 corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = tokens(col("text"))
    val mismatches = docs.select(
        fused("text").as("vs"),
        valenceSum(toks).as("sv"),
        absValenceSum(toks).as("sav"),
        matchedCount(toks).as("n"))
      .where(col("vs.sv") =!= col("sv") || col("vs.sav") =!= col("sav") ||
        col("vs.n") =!= col("n"))
      .count()
    assert(mismatches == 0L)
  }

  test("expression participates in whole-stage codegen plans") {
    // A literal input would be constant-folded away, so plan over a scan.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(fused("text").as("vs"))
    val plan = df.queryExecution.executedPlan.toString
    // The "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the scorer's Project must carry it.
    assert(plan.contains("*(1) Project"))
    assert(plan.contains("valence_stats"))
    // And the fold itself evaluates: good+bad cancel in sv, add in sav.
    val one = Seq("good bad").toDF("text").select(fused("text").as("vs"))
      .select(col("vs.sv"), col("vs.sav")).as[(Int, Int)].head()
    assert(one == ((0, 6)))
  }

  test("registration is idempotent and survives re-registration") {
    ValenceStatsExpr.register(spark)
    ValenceStatsExpr.register(spark)
    val got = spark.sql(
      "SELECT valence_stats(array('good', 'bad', 'zzz')).sav").head().getInt(0)
    assert(got == 6)
  }

  test("GraftExtensions injects valence_stats at session construction") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    // A fresh session over the same SparkContext, built through the
    // public extensions injection point — its own SessionState must
    // resolve valence_stats with no manual register() call.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      assert(s2 ne shared)
      val got = s2.sql("SELECT valence_stats(array('good', 'bad')).sv")
        .head().getInt(0)
      assert(got == 0)
      // the full native-function set rides the same injection
      val grams = s2.sql("SELECT word_grams('a b c', 2, false)")
        .head().getSeq[String](0)
      assert(grams == Seq("a b", "b c"))
      val top = s2.sql(
        "SELECT top_k(x, 2) FROM VALUES (3), (1), (5) AS t(x)")
        .head().getSeq[Int](0)
      assert(top == Seq(5, 3))
      // the round-9 fused expressions ride the same injection
      val gs = s2.sql("SELECT gram_stats('a b a b').bigram_max")
        .head().getLong(0)
      assert(gs == 2L) // "a b" occurs twice
      val gh = s2.sql("SELECT word_gram_hashes('a b c', 2, true)")
        .head().getSeq[Long](0)
      assert(gh.length == 2 && gh.forall(_ >= 0L))
      val vd = s2.sql("SELECT vec_dot(array(1L, 2L), array(3L, 4L))")
        .head().getLong(0)
      assert(vd == 11L)
      // the round-10 fused expressions ride the same injection
      val ch = s2.sql("SELECT char_gram_hashes('abcd', 3)")
        .head().getSeq[Long](0)
      assert(ch.length == 2 && ch.forall(_ >= 0L))
      val cc = s2.sql("SELECT char_gram_counts('aaaa', 3)[0].c")
        .head().getLong(0)
      assert(cc == 2L) // "aaa" twice
      // constant vector: rng = 0, every code 0 -> recon = 254*mn
      val sr = s2.sql("SELECT sq8_recon(array(5L, 5L))")
        .head().getSeq[Long](0)
      assert(sr == Seq(1270L, 1270L))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
