package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.ChatOps._

/** Property checks of the fold kernels against driver-side models
  * (SURVEY.md §5.3). ScalaCheck generators driven with deterministic
  * seeds (the scalatest-scalacheck bridge isn't on the offline
  * classpath); case counts kept small — each case is a Spark job. */
class FoldPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  test("orderedConcat equals the seq-sorted model fold for any order") {
    val gen = Gen.nonEmptyListOf(Gen.alphaStr.map(_.take(4))).map(_.take(6))
    for (ts <- cases(gen)) {
      val shuffled = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .sortBy(_._2) // arbitrary-ish reorder by text
      val got = shuffled.toDF("seq", "text")
        .agg(orderedConcat(col("seq"), col("text")).as("t"))
        .as[String].head()
      val want = shuffled.sortBy(_._1).map(_._2).mkString("\n")
      assert(got == want, s"case $ts")
    }
  }

  test("sum of count-window sums equals total over complete windows") {
    val n = 4
    val gen = Gen.listOfN(11, Gen.chooseNum(-50L, 50L))
    for (vs <- cases(gen)) {
      val rows = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      val winSum = countWindowSum(rows.toDF("key", "ord", "v"), col("key"),
        Seq(col("ord")), col("v"), n, Long.MaxValue)
        .agg(coalesce(sum("mood_micro"), lit(0L))).as[Long].head()
      val complete = vs.take(vs.length / n * n).sum
      assert(winSum == complete, s"case $vs")
    }
  }

  test("running sum is prefix-associative for any values") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)).map(_.take(8))
    for (vs <- cases(gen)) {
      val rows = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      val got = rows.toDF("key", "ord", "v")
        .withColumn("run", runningSum(col("v"), Seq(col("key")),
          Seq(col("ord"))))
        .orderBy("ord").select("run").as[Long].collect().toSeq
      val want = vs.scanLeft(0L)(_ + _).tail
      assert(got == want, s"case $vs")
    }
  }

  test("chunked running sum equals the model prefix sum for any chunk width") {
    // Random (ord, v) rows with possibly sparse, non-contiguous orders —
    // the chunk decomposition must be invisible at every width.
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(-9L, 9L))).map(_.take(10))
    for ((pairs, i) <- cases(gen).zipWithIndex) {
      // de-dup orders so the model's total order is unambiguous
      val rows = pairs.zipWithIndex
        .map { case ((o, v), j) => ("k", o * 16 + j, v) }
      val width = Seq(1L, 3L, 7L, 1000L)(i % 4)
      val got = chunkedRunningSum(rows.toDF("key", "ord", "v"), col("v"),
          Seq("key"), Seq(col("ord")), "run", width)
        .orderBy("ord").select("run").as[Long].collect().toSeq
      val want = rows.sortBy(_._2).map(_._3).scanLeft(0L)(_ + _).tail
      assert(got == want, s"case $rows width $width")
    }
  }

  test("top_k equals the sorted-take model for any values and k") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)).map(_.take(12))
    for ((vs, i) <- cases(gen).zipWithIndex) {
      val k = 1 + (i % 4)
      val got = vs.zipWithIndex.map { case (v, j) => ("k", v, j.toLong) }
        .toDF("key", "v", "id")
        .repartition(3)
        .groupBy(col("key"))
        .agg(graft.functions.TopKAgg.topK(spark, col("v"), k).as("top"))
        .select(explode(col("top"))).as[Long].collect().toSeq
      val want = vs.sorted.reverse.take(k)
      assert(got == want, s"case $vs k=$k")
    }
  }
}
