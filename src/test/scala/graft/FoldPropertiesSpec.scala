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

  test("dedupSubstring equals the naive run-merge model on random corpora") {
    // naive reference: per doc, every g-gram occurrence whose gram also
    // appears in a LOWER doc_id is duplicated; merge [p, p+g-1]
    // intervals that overlap or touch; report per-doc run stats
    def model(texts: Seq[(Long, String)], g: Int)
        : Seq[(Long, Long, Long, Long, Long)] = {
      val toks = texts.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val occ = texts.flatMap { case (id, _) =>
        toks(id).sliding(g).zipWithIndex.collect {
          case (w, p) if w.size == g => (id, p, w.mkString(" ")) } }
      val minDoc = occ.groupBy(_._3).map { case (gr, os) =>
        gr -> os.map(_._1).min }
      occ.filter { case (id, _, gr) => minDoc(gr) < id }
        .groupBy(_._1).toSeq.map { case (id, os) =>
          val ps = os.map(_._2).sorted
          val runs = ps.foldLeft(List.empty[(Int, Int)]) {
            case ((s, e) :: rest, p) if p <= e + 1 =>
              (s, math.max(e, p + g - 1)) :: rest
            case (acc, p) => (p, p + g - 1) :: acc
          }.reverse
          (id, toks(id).size.toLong, runs.size.toLong,
            runs.map(r => r._2 - r._1 + 1L).sum,
            runs.map(r => r._2 - r._1 + 1L).max)
        }.sortBy(_._1)
    }
    // tiny vocab forces heavy gram collisions — the hard case
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(6, doc)
    for ((texts, i) <- cases(corpus, 6).zipWithIndex) {
      val g = 2 + (i % 3)
      val rows = texts.zipWithIndex.map { case (t, j) =>
        (j.toLong, t, "en", "s0", t.length.toLong) }
      val dir = java.nio.file.Files.createTempDirectory("substr-prop")
        .toString
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = graft.pipeline.DataOps.dedupSubstring(spark, dir, g)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val want = model(rows.map(r => (r._1, r._2)), g)
      assert(got == want, s"case g=$g texts=$texts")
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
