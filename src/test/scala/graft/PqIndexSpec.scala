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
}
