package graft

import org.apache.spark.sql.functions._

import graft.functions.WordGramsExpr

/** [[graft.functions.WordGramsExpr]] must be bit-identical to the
  * composed higher-order form it replaces (filter(split) + transform
  * (sequence) + array_distinct) on every edge the corpus can contain. */
class WordGramsSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "",                      // empty text
    " ",                     // single space
    "    ",                  // all spaces
    "one",                   // below any n>1
    "a b",                   // exactly 2 words
    "a b c",                 // exactly one 3-shingle
    "a  b   c",              // multi-space runs (empties dropped)
    " lead and trail ",      // boundary spaces
    "tab\tinside stays one-token here ok", // tab is NOT a separator
    "x y x y x y",           // duplicate grams (distinct matters)
    "ü ñ 漢 字 mixed unicode words")

  /** The original composed form, kept as the spec. */
  private def composed(n: Int, distinct: Boolean) = {
    val w = filter(split(col("t"), " "), x => x =!= lit(""))
    val raw = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(w, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    if (distinct) array_distinct(raw) else raw
  }

  test("native word_grams equals the composed form for n in 1..4") {
    for (n <- 1 to 4; distinct <- Seq(true, false)) {
      val df = fixtures.toDF("t")
      val got = df.select(
        WordGramsExpr.grams(spark, col("t"), n, distinct).as("g"))
        .as[Seq[String]].collect().toSeq
      val want = df.select(composed(n, distinct).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n distinct=$distinct")
    }
  }

  test("word_grams stays inside whole-stage codegen") {
    // A parquet-backed scan (a LocalTableScan of literals never enters
    // codegen regardless of the expression).
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(WordGramsExpr.grams(spark, col("text"), 3, distinct = true))
      .queryExecution.executedPlan.toString
    // codegen'd operators print with a `*(stageId)` marker; the project
    // hosting word_grams must carry one (CodegenFallback would strip it)
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")), plan)
  }
}
