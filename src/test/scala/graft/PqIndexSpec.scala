package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.PqIndex

/** The persistent PQ store ([[PqIndex]]) must serve EXACTLY what the
  * fresh-model probe computes: every store relation is exact integers,
  * so the parquet round-trip is lossless and the probe over the store
  * is plan-identical to [[DataOps.annPq]]'s second half. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, Long)].collect().toSet

  test("the store round-trip reproduces annPq exactly") {
    assert(rows(PqIndex.annPqIndexed(spark, SF)) ==
      rows(DataOps.annPq(spark, SF)))
  }

  test("one store serves the composed IVFPQ probe == the fresh model") {
    assert(rows(PqIndex.annIvfPqIndexed(spark, SF)) ==
      rows(DataOps.annIvfPq(spark, SF)))
  }

  test("removeBatch inverts appendBatch bit-for-bit; append is decomposition-invariant") {
    val v = DataOps.emb(spark, SF)
    def rels(dir: String) = Seq("codebook", "codes", "centroids",
      "cells").map { rel =>
      rel -> spark.read.parquet(s"$dir/$rel")
        .collect().map(_.toSeq).toSet
    }.toMap
    // S = even-half build; B = the odd half appended (frozen codebook)
    val dir = Files.createTempDirectory("graft-pq-life").toString
    PqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), dir)
    val s0 = rels(dir)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), dir)
    // the model is frozen: only the corpus-sized relations grew
    val s1 = rels(dir)
    assert(s1("codebook") == s0("codebook"))
    assert(s1("centroids") == s0("centroids"))
    assert(s0("codes").subsetOf(s1("codes")) &&
      s1("codes").size > s0("codes").size)
    // remove(append(S, B), B) == S, relation by relation
    PqIndex.removeBatch(spark,
      v.where(col("vec_id") % 2 === 1).select(col("vec_id")), dir)
    assert(rels(dir) == s0)
    // and append in two quarters == append in one half
    val dir2 = Files.createTempDirectory("graft-pq-life2").toString
    PqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), dir2)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 4 === 1), dir2)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 4 === 3), dir2)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), dir)
    assert(rels(dir2) == rels(dir))
    // compact folds the append pileup without changing contents
    val before = rels(dir2)
    PqIndex.compact(spark, dir2)
    assert(rels(dir2) == before)
    assert(Seq("codes", "cells").forall { rel =>
      new java.io.File(s"$dir2/$rel").listFiles()
        .count(_.getName.endsWith(".parquet")) == 1
    })
  }

  test("lifecycle registry entries replay their splits end-to-end") {
    // incremental: even-trained codebook coding the full corpus
    val v = DataOps.emb(spark, SF)
    val even = v.where(col("vec_id") % 2 === 0)
    val refined = DataOps.pqTrain(even, DataOps.pqElements(even))
    val wantInc = rows(DataOps.pqProbe(spark,
      DataOps.annQueries(spark, SF), refined,
      DataOps.pqAssign(DataOps.pqElements(v), refined), v))
    assert(rows(PqIndex.annPqIncremental(spark, SF)) == wantInc)
    // removed: full-trained model, survivors-only codes — and no odd
    // vec_id may surface as a neighbor
    val got = rows(PqIndex.annPqRemoved(spark, SF))
    val (_, refFull, codedFull) = DataOps.pqParts(spark, SF)
    assert(got == rows(DataOps.pqProbe(spark,
      DataOps.annQueries(spark, SF), refFull,
      codedFull.where(col("vec_id") % 2 === 0), v)))
    assert(got.nonEmpty && got.forall(_._2 % 2 == 0))
    // the two mutated stores answer differently from the pristine one
    // on this corpus (the audit would catch a no-op lifecycle)
    val pristine = rows(DataOps.annPq(spark, SF))
    assert(got != pristine)
  }

  test("one build serves two query batches, results identical to the fresh model") {
    val dir = Files.createTempDirectory("graft-pqidx").toString
    PqIndex.build(spark, SF, dir)
    // the store is complete and bounded: 1024 codebook rows, one code
    // per (vector, sub-space), one cell per vector
    val nVec = spark.read.parquet(s"$SF/embeddings.parquet").count()
    assert(spark.read.parquet(s"$dir/codebook").count() <=
      (DataOps.PqM * DataOps.PqK * DataOps.PqSubDim).toLong)
    assert(spark.read.parquet(s"$dir/codes").count() ==
      nVec * DataOps.PqM)
    assert(spark.read.parquet(s"$dir/cells").count() == nVec)

    val q = DataOps.annQueries(spark, SF)
    val b1 = PqIndex.queryAgainst(spark,
      q.where(col("q_id") % 100 === 0), dir, SF)
    val b2 = PqIndex.queryAgainst(spark,
      q.where(col("q_id") % 100 =!= 0), dir, SF)
    val full = rows(DataOps.annPq(spark, SF))
    assert(rows(b1).nonEmpty && rows(b2).nonEmpty)
    assert((rows(b1) ++ rows(b2)) == full)
    // disjoint batches: per-query answers are independent of the batch
    assert(rows(b1).map(_._1).intersect(rows(b2).map(_._1)).isEmpty)
  }

  test("statsOf telemetry tracks every lifecycle mutation") {
    val v = DataOps.emb(spark, SF)
    def stats(dir: String) =
      PqIndex.statsOf(spark, dir).collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-pq-tel").toString
    PqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), dir)
    val evens = stats(dir)
    // append moves the corpus-sized counters; remove restores exactly
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), dir)
    val full = stats(dir)
    assert(full != evens)
    PqIndex.removeBatch(spark,
      v.where(col("vec_id") % 2 === 1).select("vec_id"), dir)
    assert(stats(dir) == evens)
    // the registry form reads the same numbers off a full-corpus build
    val fullDir = Files.createTempDirectory("graft-pq-tel-full").toString
    PqIndex.build(spark, SF, fullDir)
    assert(PqIndex.pqStats(spark, SF).collect().map(_.toSeq).toSet ==
      stats(fullDir))
  }
}
