package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.PositionsIndex

/** The persistent positional index ([[PositionsIndex]], K10) must be a
  * lossless round-trip (positions are exact integers, so probing the
  * read-back store is IDENTICAL to the self-contained batch operator)
  * with the K9 lifecycle invariants: per-doc-additive append, exact-
  * inverse removal, contents-identical compaction. */
class PositionsIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Long, Long)].collect().toSet

  test("store probes reproduce the batch operator; lifecycle invariants hold") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def store(dir: String) = spark.read.parquet(s"$dir/positions")
      .collect().map(_.toSeq).toSet
    val batch = rows(DataOps.phraseSearch(spark, SF))
    assert(batch.nonEmpty)
    // round-trip == batch operator
    assert(rows(PositionsIndex.phraseIndexed(spark, SF)) == batch)
    // build(evens)+append(odds) == one-shot build, relation-identical
    val full = Files.createTempDirectory("graft-pos-one").toString
    PositionsIndex.buildFrom(spark, d, full)
    val inc = Files.createTempDirectory("graft-pos-two").toString
    PositionsIndex.buildFrom(spark, d.where(col("doc_id") % 2 === 0), inc)
    val s0 = store(inc)
    PositionsIndex.appendBatch(spark, d.where(col("doc_id") % 2 === 1), inc)
    assert(store(inc) == store(full))
    assert(rows(PositionsIndex.phraseIncremental(spark, SF)) == batch)
    // remove(append(S,B),B) == S; compact preserves contents
    PositionsIndex.removeBatch(spark,
      d.where(col("doc_id") % 2 === 1).select("doc_id"), inc)
    assert(store(inc) == s0)
    PositionsIndex.compact(spark, inc)
    assert(store(inc) == s0)
    assert(new java.io.File(s"$inc/positions").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // deletion: no victim reports a hit; survivors answer exactly the
    // evens-filtered probe (head still the full corpus's phrase)
    val removed = rows(PositionsIndex.phraseRemoved(spark, SF))
    assert(removed.nonEmpty && removed.forall(_._1 % 2 == 0))
    assert(removed == rows(DataOps.phraseProbeStage(
      DataOps.positionsOf(spark, d.where(col("doc_id") % 2 === 0)),
      DataOps.phraseParts(spark, d))))
    assert(removed != batch)
    // ad-hoc phrase serving: a caller-supplied phrase probes the store
    val adhoc = Seq(("the quick fox", 0, "the"), ("the quick fox", 1, "quick"),
      ("the quick fox", 2, "fox")).toDF("g", "i", "t")
    PositionsIndex.phraseAgainst(spark, adhoc, full).collect()
  }

  test("proximityServe: batched pairs == per-pair probes; store-served == fresh") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    val served = DataOps.proximityServe(spark, SF)
      .as[(Long, Long, String, String, Long, Long)].collect().toSet
    assert(served.nonEmpty && served.map(_._1) == Set(1L, 2L))
    // q_id 1 IS the standard single-pair probe
    val single = DataOps.proximitySearch(spark, SF)
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(served.filter(_._1 == 1L)
      .map(r => (r._2, r._3, r._4, r._5, r._6)) == single)
    // every pair answered from the batch == that pair probed alone
    val terms = DataOps.proximityServeTerms(spark, d)
      .as[(Long, String, String)].collect()
    for (q <- Seq(1L, 2L)) {
      val one = DataOps.proximityStage(DataOps.positionsOf(spark, d),
        terms.filter(_._1 == q).map(t => (t._2, t._3)).toSeq
          .toDF("t", "role"))
        .as[(Long, String, String, Long, Long)].collect().toSet
      assert(served.filter(_._1 == q)
        .map(r => (r._2, r._3, r._4, r._5, r._6)) == one, s"q=$q")
    }
    // the K10 store serves the same batch verbatim
    val dir = Files.createTempDirectory("graft-pos-serve").toString
    PositionsIndex.buildFrom(spark, d, dir)
    val fromStore = PositionsIndex.proximityServeAgainst(spark,
      DataOps.proximityServeTerms(spark, d), dir)
      .as[(Long, Long, String, String, Long, Long)].collect().toSet
    assert(fromStore == served)
  }

  test("statsOf telemetry tracks every lifecycle mutation") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def stats(dir: String) =
      PositionsIndex.statsOf(spark, dir).collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-pos-tel").toString
    PositionsIndex.buildFrom(spark, d.where(col("doc_id") % 2 === 0), dir)
    val evens = stats(dir)
    // append moves the counters and checksum; remove restores exactly
    PositionsIndex.appendBatch(spark,
      d.where(col("doc_id") % 2 === 1), dir)
    val fullStats = stats(dir)
    assert(fullStats != evens)
    PositionsIndex.removeBatch(spark,
      d.where(col("doc_id") % 2 === 1).select("doc_id"), dir)
    assert(stats(dir) == evens)
    // per-doc positions: the maintained store's telemetry == a
    // one-shot build's, and the registry form reads exactly that
    val fullDir = Files.createTempDirectory("graft-pos-tel-full").toString
    PositionsIndex.buildFrom(spark, d, fullDir)
    assert(fullStats == stats(fullDir))
    assert(PositionsIndex.positionsStats(spark, SF)
      .collect().map(_.toSeq).toSet == stats(fullDir))
  }

  test("bucketed positions layout: pruned phrase probe == directory probe") {
    val dir = Files.createTempDirectory("graft-pos-bkt").toString
    PositionsIndex.build(spark, SF, dir)
    try {
      PositionsIndex.writeBucketedPositions(spark, dir,
        "g_positions_bkt", 8)
      // bucketed table == the directory relation, row for row
      assert(spark.table("g_positions_bkt").collect().map(_.toSeq).toSet
        == spark.read.parquet(s"$dir/positions")
          .collect().map(_.toSeq).toSet)
      // a literal-token phrase probe returns exactly the directory
      // store's answer for the same phrase
      val d = spark.read.parquet(s"$SF/documents.parquet")
        .select(col("doc_id"), col("text"))
      val partRows = DataOps.phraseParts(spark, d)
        .select(col("g"), col("i"), col("t")).collect()
      val parts = partRows.toSeq
        .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toDF("g", "i", "t")
      val bucketed = PositionsIndex.phraseAgainstBucketed(spark,
        partRows.map(_.getString(2)).distinct.toSeq, parts,
        "g_positions_bkt")
      assert(bucketed.collect().map(_.toSeq).toSet ==
        PositionsIndex.phraseAgainst(spark, parts, dir)
          .collect().map(_.toSeq).toSet)
      // ... and its scan PRUNES to the tokens' buckets — the
      // posting-list-lookup cost, visible in the plan
      val scan = bucketed.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount"),
        s"no bucket pruning in:\n$scan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_positions_bkt")
      ()
    }
  }
}
