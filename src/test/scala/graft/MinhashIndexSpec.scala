package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.MinhashIndex

/** The persistent-index incremental dedup ([[MinhashIndex]]) must agree
  * with the batch operator: a document's signature depends only on its
  * own text, so new-vs-indexed banded candidates and their exact-Jaccard
  * verdicts are exactly the batch run's cross pairs. */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("incremental dedup against the index equals the batch cross pairs") {
    val indexDir = Files.createTempDirectory("graft-mhidx").toString
    val docs = spark.read.parquet(s"$SF/documents.parquet")
    // corpus = even doc_ids (indexed once), snapshot = odd doc_ids
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val snapshot = docs.where(col("doc_id") % 2 === 1)
    MinhashIndex.build(spark, corpus, indexDir)

    val inc = MinhashIndex.dedupAgainst(spark, snapshot, indexDir)
      .as[(Long, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2) -> r._3).toMap

    // batch over the union, restricted to (even, odd) pairs, re-oriented
    // as (snapshot doc, indexed doc)
    val batch = DataOps.dedupMinhash(spark, SF)
      .as[(Long, Long, Long)].collect().toSeq
      .filter(p => (p._1 % 2 == 0) != (p._2 % 2 == 0))
      .map { case (a, b, j) =>
        (if (a % 2 == 1) (a, b) else (b, a)) -> j
      }.toMap

    assert(inc.nonEmpty, "no cross near-dup pairs on the fixture")
    assert(inc == batch)
    // index-only scope: never a snapshot-snapshot or corpus-corpus pair
    assert(inc.keys.forall { case (n, o) => n % 2 == 1 && o % 2 == 0 })
  }

  test("dedupIndexed registry entry replays the store split end-to-end") {
    val got = MinhashIndex.dedupIndexed(spark, SF)
      .as[(Long, Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$SF/documents.parquet")
    val dir = Files.createTempDirectory("graft-mhidx-reg").toString
    MinhashIndex.build(spark, docs.where(col("doc_id") % 2 === 0), dir)
    val want = MinhashIndex
      .dedupAgainst(spark, docs.where(col("doc_id") % 2 === 1), dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // orientation: doc_id is always the snapshot side, dup_of the index
    assert(got.forall { case (d, o, _) => d % 2 == 1 && o % 2 == 0 })
  }

  test("the index is reusable: a second snapshot probes the same store") {
    val indexDir = Files.createTempDirectory("graft-mhidx2").toString
    val docs = spark.read.parquet(s"$SF/documents.parquet")
    MinhashIndex.build(spark, docs.where(col("doc_id") % 2 === 0), indexDir)
    // two disjoint snapshots against one build
    val s1 = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 4 === 1), indexDir)
      .as[(Long, Long, Long)].collect().toSet
    val s2 = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 4 === 3), indexDir)
      .as[(Long, Long, Long)].collect().toSet
    val all = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 2 === 1), indexDir)
      .as[(Long, Long, Long)].collect().toSet
    assert((s1 ++ s2) == all)
    assert(s1.map(_._1).forall(_ % 4 == 1) && s2.map(_._1).forall(_ % 4 == 3))
  }

  test("appendBatch merge is batch-decomposition-invariant; compact preserves contents") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def rels(dir: String) = Seq("shingles", "bands").map { rel =>
      rel -> spark.read.parquet(s"$dir/$rel")
        .collect().map(_.toSeq).toSet
    }.toMap
    // one-shot build over the full corpus ...
    val full = Files.createTempDirectory("graft-mh-one").toString
    MinhashIndex.build(spark, docs, full)
    // ... vs build(third) + append(third) + append(third)
    val inc = Files.createTempDirectory("graft-mh-three").toString
    MinhashIndex.build(spark, docs.where(col("doc_id") % 3 === 0), inc)
    MinhashIndex.appendBatch(spark, docs.where(col("doc_id") % 3 === 1), inc)
    MinhashIndex.appendBatch(spark, docs.where(col("doc_id") % 3 === 2), inc)
    assert(rels(inc) == rels(full))
    // compact re-lays-out the files without changing contents, and a
    // probe over the compacted store answers identically
    val before = rels(inc)
    val probeBefore = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 97 === 1), inc)
      .as[(Long, Long, Long)].collect().toSet
    MinhashIndex.compact(spark, inc)
    assert(rels(inc) == before)
    assert(Seq("shingles", "bands").forall { rel =>
      new java.io.File(s"$inc/$rel").listFiles()
        .count(_.getName.endsWith(".parquet")) == 1
    })
    val probeAfter = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 97 === 1), inc)
      .as[(Long, Long, Long)].collect().toSet
    assert(probeAfter == probeBefore)
  }

  test("statsOf telemetry tracks every lifecycle mutation") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def stats(dir: String) =
      MinhashIndex.statsOf(spark, dir).collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-mh-tel").toString
    MinhashIndex.build(spark, docs.where(col("doc_id") % 2 === 0), dir)
    val evens = stats(dir)
    // append moves every counter; remove restores them exactly
    MinhashIndex.appendBatch(spark, docs.where(col("doc_id") % 2 === 1), dir)
    val full = stats(dir)
    assert(full != evens)
    MinhashIndex.removeBatch(spark,
      docs.where(col("doc_id") % 2 === 1).select("doc_id"), dir)
    assert(stats(dir) == evens)
    // the registry form reads the same numbers off a full-corpus build
    val reg = MinhashIndex.minhashStats(spark, SF)
      .collect().map(_.toSeq).toSet
    val fullDir = Files.createTempDirectory("graft-mh-tel-full").toString
    MinhashIndex.build(spark, docs, fullDir)
    assert(reg == stats(fullDir) && reg == full)
  }

  test("dedupIncremental registry entry: two-step store == one-shot build probe") {
    val got = MinhashIndex.dedupIncremental(spark, SF)
      .as[(Long, Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft-mh-incr-spec").toString
    MinhashIndex.build(spark, docs.where(col("doc_id") % 3 < 2), dir)
    val want = MinhashIndex.dedupAgainst(spark,
      docs.where(col("doc_id") % 3 === 2), dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // snapshot docs can match APPENDED documents, not just the bootstrap
    // build — the gap the lifecycle exists to close
    assert(got.exists { case (_, o, _) => o % 3 == 1 })
    assert(got.forall { case (d, o, _) => d % 3 == 2 && o % 3 < 2 })
  }

  test("removeBatch forgets the odd half: shrunken index == evens-only build") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def rels(dir: String) = Seq("shingles", "bands").map { rel =>
      rel -> spark.read.parquet(s"$dir/$rel")
        .collect().map(_.toSeq).toSet
    }.toMap
    val evens = Files.createTempDirectory("graft-mh-evens").toString
    MinhashIndex.build(spark, docs.where(col("doc_id") % 2 === 0), evens)
    val full = Files.createTempDirectory("graft-mh-full").toString
    MinhashIndex.build(spark, docs, full)
    MinhashIndex.removeBatch(spark,
      docs.where(col("doc_id") % 2 === 1).select("doc_id"), full)
    assert(rels(full) == rels(evens))
    // and the registry deletion round-trip equals the build-split form
    val got = MinhashIndex.dedupRemoved(spark, SF)
      .as[(Long, Long, Long)].collect().toSet
    val want = MinhashIndex.dedupIndexed(spark, SF)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bucketed band layout: probe == directory probe with only the snapshot side shuffling") {
    val dir = Files.createTempDirectory("graft-mh-bkt").toString
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val snapshot = docs.where(col("doc_id") % 2 === 1)
    MinhashIndex.build(spark, corpus, dir)
    try {
      MinhashIndex.writeBucketedBands(spark, dir, "g_bands_bkt", 8)
      // bucketed table == the directory relation, row for row
      assert(spark.table("g_bands_bkt").collect().map(_.toSeq).toSet ==
        spark.read.parquet(s"$dir/bands").collect().map(_.toSeq).toSet)
      // probe over the bucketed layout == the directory probe
      val bucketed = MinhashIndex.dedupAgainstBucketed(spark, snapshot,
        "g_bands_bkt", dir)
      assert(bucketed.collect().map(_.toSeq).toSet ==
        MinhashIndex.dedupAgainst(spark, snapshot, dir)
          .collect().map(_.toSeq).toSet)
      // co-location: with broadcast off, a bh-keyed count over the
      // bucketed table needs NO exchange (the scan already carries
      // HashPartitioning(bh)) — the corpus-side shuffle the directory
      // layout pays per snapshot is gone
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val agg = spark.table("g_bands_bkt").groupBy("bh").count()
        agg.collect()
        assert(!agg.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"),
          "bh aggregate over the bucketed bands shuffled")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        ()
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_bands_bkt")
      ()
    }
  }
}
