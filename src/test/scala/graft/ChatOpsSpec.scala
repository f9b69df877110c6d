package graft

import org.apache.spark.sql.functions._

import graft.ops.ChatOps._

/** Unit coverage of the keyed-window-reduce kernel (SURVEY.md §2.4):
  * tumbling bucket math, the order-sensitive concat fold, the running
  * reduce, and the count-window fold with its partial-window drop and
  * `<=` threshold boundary (reference SentimentAnalysis.scala:304-311). */
class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tumble buckets integer seconds to window starts") {
    val df = Seq(0L, 1L, 9L, 10L, 29L, 30L, 31L).toDF("sec")
      .select(tumble(col("sec"), 10).as("w"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 0L, 10L, 20L, 30L, 30L))
  }

  test("orderedConcat restores arrival order regardless of input order") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"))
      .toDF("seq", "text")
      .agg(orderedConcat(col("seq"), col("text")).as("t"))
    assert(df.as[String].head() == "a\nb\nc")
  }

  test("orderedConcat of a single element is the element itself") {
    val df = Seq((7L, "only")).toDF("seq", "text")
      .agg(orderedConcat(col("seq"), col("text")).as("t"))
    assert(df.as[String].head() == "only")
  }

  test("runningSum emits the per-key cumulative value in order") {
    val df = Seq(("k", 1L, 10L), ("k", 2L, -4L), ("k", 3L, 1L),
        ("j", 1L, 5L))
      .toDF("key", "ord", "v")
      .withColumn("run", runningSum(col("v"), Seq(col("key")),
        Seq(col("ord"))))
      .orderBy("key", "ord")
    assert(df.select("run").as[Long].collect().toSeq ==
      Seq(5L, 10L, 6L, 7L))
  }

  test("countWindowSum drops incomplete trailing windows") {
    // 7 rows, n=3 -> windows of rows 1-3 and 4-6 fire; row 7 is dropped.
    val rows = (1 to 7).map(i => ("k", i.toLong, -100L))
    val out = countWindowSum(rows.toDF("key", "ord", "v"), col("key"),
      Seq(col("ord")), col("v"), 3, 0L)
    assert(out.count() == 2)
  }

  test("countWindowSum threshold is <= (boundary fires, one above does not)") {
    // Window sums exactly at the threshold must pass the filter
    // (reference uses <=, SentimentAnalysis.scala:311).
    val atThr = Seq(("k", 1L, -5L), ("k", 2L, -5L), ("k", 3L, -5L))
    val fired = countWindowSum(atThr.toDF("key", "ord", "v"), col("key"),
      Seq(col("ord")), col("v"), 3, -15L)
    assert(fired.count() == 1)

    val above = Seq(("k", 1L, -5L), ("k", 2L, -5L), ("k", 3L, -4L))
    val notFired = countWindowSum(above.toDF("key", "ord", "v"), col("key"),
      Seq(col("ord")), col("v"), 3, -15L)
    assert(notFired.count() == 0)
  }

  test("countWindowSum windows are per key and respect the order column") {
    val rows = Seq(
      ("a", 2L, -10L), ("a", 1L, 10L),   // out of order: sums to 0, kept out
      ("b", 1L, -10L), ("b", 2L, -10L))  // sums to -20, fires
    val out = countWindowSum(rows.toDF("key", "ord", "v"), col("key"),
      Seq(col("ord")), col("v"), 2, -15L)
    val got = out.select("key").as[String].collect().toSeq
    assert(got == Seq("b"))
  }

  test("countWindowSum positive values never fire a negative threshold") {
    val rows = (1 to 10).map(i => ("k", i.toLong, 1L))
    val out = countWindowSum(rows.toDF("key", "ord", "v"), col("key"),
      Seq(col("ord")), col("v"), 5, -1L)
    assert(out.count() == 0)
  }

  /** Crafted multi-key input whose order values straddle many chunks at
    * width 4, with a duplicate leading-order value disambiguated by the
    * second order column. */
  private lazy val chunky = {
    val rows =
      (0 until 97).map(i => ("hot", (i * 13L) % 97, i.toLong, (i % 7) - 3L)) ++
        (0 until 11).map(i => ("warm", i.toLong, 100L + i, -2L)) ++
        Seq(("dup", 5L, 0L, -1L), ("dup", 5L, 1L, -4L), ("dup", 6L, 2L, -1L))
    rows.toDF("key", "ord", "ord2", "v").repartition(5, col("ord2"))
  }

  test("chunked countWindowSum matches the naive single-window form") {
    for (n <- Seq(2, 3, 10); width <- Seq(1L, 4L, 1000L)) {
      val chunked = countWindowSum(chunky, col("key"),
        Seq(col("ord"), col("ord2")), col("v"), n, 100L, width)
        .as[(String, Long, Long)].collect().toSet
      val naive = countWindowSumNaive(chunky, col("key"),
        Seq(col("ord"), col("ord2")), col("v"), n, 100L)
        .as[(String, Long, Long)].collect().toSet
      assert(chunked == naive, s"n=$n width=$width")
      assert(chunked.nonEmpty, s"vacuous fixture n=$n")
    }
  }

  test("chunkedRunningSum matches the analytic running sum exactly") {
    for (width <- Seq(1L, 4L, 1000L)) {
      val viaChunks = chunkedRunningSum(chunky, col("v"), Seq("key"),
        Seq(col("ord"), col("ord2")), "run", width)
        .select("key", "ord", "ord2", "run")
        .as[(String, Long, Long, Long)].collect().toSet
      val viaWindow = chunky.withColumn("run",
        runningSum(col("v"), Seq(col("key")),
          Seq(col("ord"), col("ord2"))))
        .select("key", "ord", "ord2", "run")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(viaChunks == viaWindow, s"width=$width")
    }
  }
}
