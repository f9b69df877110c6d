package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.SqIndex

/** The persistent SQ store ([[SqIndex]]) must serve EXACTLY what the
  * fresh-model probe computes: the reconstruction relation is exact
  * integers, so the parquet round-trip is lossless and the probe over
  * the store is plan-identical to [[DataOps.annSq]]'s second half. */
class SqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, Long)].collect().toSet

  test("the store round-trip reproduces annSq exactly") {
    assert(rows(SqIndex.annSqIndexed(spark, SF)) ==
      rows(DataOps.annSq(spark, SF)))
  }

  test("removeBatch inverts appendBatch; two-step store == one-shot build") {
    val v = DataOps.emb(spark, SF)
    def recon(dir: String) = spark.read.parquet(s"$dir/recon")
      .collect().map(_.toSeq).toSet
    // two-step (evens build + odds append) == one-shot full build:
    // SQ8 codes are per-vector, so the relations are identical
    val full = Files.createTempDirectory("graft-sq-one").toString
    SqIndex.build(spark, SF, full)
    val inc = Files.createTempDirectory("graft-sq-two").toString
    SqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), inc)
    val s0 = recon(inc)
    SqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), inc)
    assert(recon(inc) == recon(full))
    // remove(append(S, B), B) == S
    SqIndex.removeBatch(spark,
      v.where(col("vec_id") % 2 === 1).select(col("vec_id")), inc)
    assert(recon(inc) == s0)
    // compact folds the append pileup without changing contents
    SqIndex.compact(spark, inc)
    assert(recon(inc) == s0)
    assert(new java.io.File(s"$inc/recon").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // registry entries: incremental == annSq verbatim; removed ==
    // survivors-only probe with no odd neighbor surfacing
    assert(rows(SqIndex.annSqIncremental(spark, SF)) ==
      rows(DataOps.annSq(spark, SF)))
    val got = rows(SqIndex.annSqRemoved(spark, SF))
    assert(got == rows(DataOps.sqProbe(spark,
      DataOps.annQueries(spark, SF),
      DataOps.sqRecon(spark, v.where(col("vec_id") % 2 === 0)), v)))
    assert(got.nonEmpty && got.forall(_._2 % 2 == 0))
    assert(got != rows(DataOps.annSq(spark, SF)))
  }

  test("one build serves two query batches, identical to the fresh model") {
    val dir = Files.createTempDirectory("graft-sqidx").toString
    SqIndex.build(spark, SF, dir)
    // the store is complete: one reconstruction row per vector
    val nVec = spark.read.parquet(s"$SF/embeddings.parquet").count()
    assert(spark.read.parquet(s"$dir/recon").count() == nVec)

    val q = DataOps.annQueries(spark, SF)
    val b1 = SqIndex.queryAgainst(spark,
      q.where(col("q_id") % 100 === 0), dir, SF)
    val b2 = SqIndex.queryAgainst(spark,
      q.where(col("q_id") % 100 =!= 0), dir, SF)
    val full = rows(DataOps.annSq(spark, SF))
    assert(rows(b1).nonEmpty && rows(b2).nonEmpty)
    assert((rows(b1) ++ rows(b2)) == full)
    // disjoint batches: per-query answers are independent of the batch
    assert(rows(b1).map(_._1).intersect(rows(b2).map(_._1)).isEmpty)
  }

  test("statsOf telemetry tracks every lifecycle mutation") {
    val v = DataOps.emb(spark, SF)
    def stats(dir: String) =
      SqIndex.statsOf(spark, dir).collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-sq-tel").toString
    SqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), dir)
    val evens = stats(dir)
    // append moves the counters and checksum; remove restores exactly
    SqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), dir)
    val full = stats(dir)
    assert(full != evens)
    SqIndex.removeBatch(spark,
      v.where(col("vec_id") % 2 === 1).select("vec_id"), dir)
    assert(stats(dir) == evens)
    // per-vector codes: the maintained store's telemetry == a one-shot
    // full build's, and the registry form reads exactly that
    val fullDir = Files.createTempDirectory("graft-sq-tel-full").toString
    SqIndex.build(spark, SF, fullDir)
    assert(SqIndex.sqStats(spark, SF).collect().map(_.toSeq).toSet ==
      stats(fullDir))
  }
}
