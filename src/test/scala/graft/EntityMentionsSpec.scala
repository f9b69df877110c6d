package graft

import org.apache.spark.sql.functions._

import graft.functions.EntityMentionsExpr
import graft.nlp.NlpFunctions

/** [[graft.functions.EntityMentionsExpr]] must be bit-identical to the
  * composed higher-order [[NlpFunctions.entityMentions]] — same
  * non-overlapping greedy `[A-Z][a-z]+` matches, same lexicon-token
  * pass, same order and duplicates. */
class EntityMentionsSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "",                              // empty
    "no capitals here",              // lexicon-only path
    "Spark and Flink move data",     // capitalized + maybe-lexicon mix
    "ABc DEF Gh I J K",              // failed starts: AB, DEF, single caps
    "SparkSparkSpark",               // one capital, long tail, inner caps
    "A",                             // trailing capital, no lowercase
    "ÜberSpark Ärger Naïve café",    // unicode around ASCII classes
    "Spark Spark spark SPARK",       // duplicates must be preserved
    "x Spark, y Flink; z!")          // punctuation boundaries

  test("native entity_mentions equals the composed form") {
    val df = fixtures.toDF("t")
    val got = df.select(
      EntityMentionsExpr.mentions(spark, col("t")).as("m"))
      .as[Seq[String]].collect().toSeq
    val want = df.select(
      NlpFunctions.entityMentions(col("t"),
        NlpFunctions.tokens(col("t"))).as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == want)
    // the duplicates fixture really produces repeated mentions
    assert(got(7).count(_ == "spark") >= 2, got(7))
  }

  test("entity_mentions agrees with the composed form on real corpus text") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = df.select(
      EntityMentionsExpr.mentions(spark, col("text")).as("a"),
      NlpFunctions.entityMentions(col("text"),
        NlpFunctions.tokens(col("text"))).as("b"))
      .where(not(col("a") === col("b")))
      .count()
    assert(diff == 0)
  }

  test("entity_mentions stays inside whole-stage codegen") {
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(EntityMentionsExpr.mentions(spark, col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")), plan)
  }
}
