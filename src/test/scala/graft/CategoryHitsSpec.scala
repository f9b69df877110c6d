package graft

import org.apache.spark.sql.functions._

import graft.functions.CategoryHitsExpr
import graft.nlp.NlpFunctions

/** [[graft.functions.CategoryHitsExpr]] must be bit-identical to the
  * composed higher-order [[NlpFunctions.categoriesArr]] it replaces —
  * same categories, same declaration order, same conf_micro rounding. */
class CategoryHitsSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "",                                     // no tokens
    "nothing matches in this sentence",     // zero categories
    "join the stream",                      // two single-hit categories
    "join join merge hash join",            // repeated keywords
    "JOIN Merge HASH",                      // tokenizer lowercases
    "key value data table row column part line", // every storage keyword
    "query scan filter sort agg group order stream window batch join " +
      "merge hash fast slow big small table row",  // all five categories
    "a key, a value; data!",                // punctuation-split tokens
    "fast fast fast fast fast fast fast")   // single hot category

  test("native category_hits equals the composed categoriesArr") {
    val df = fixtures.toDF("t").select(
      NlpFunctions.tokens(col("t")).as("toks"))
    val got = df
      .select(CategoryHitsExpr.cats(spark, col("toks")).cast("string"))
      .as[String].collect().toSeq
    val want = df
      .select(NlpFunctions.categoriesArr(col("toks")).cast("string"))
      .as[String].collect().toSeq
    assert(got == want)
    // the all-five fixture really exercises every category
    assert(got(6).count(_ == '{') == 5, got(6))
  }

  test("category_hits stays inside whole-stage codegen") {
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(CategoryHitsExpr.cats(spark,
        NlpFunctions.tokens(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")), plan)
  }
}
