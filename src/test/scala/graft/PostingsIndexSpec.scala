package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.PostingsIndex

/** The persistent retrieval store ([[PostingsIndex]]) must be a
  * lossless round-trip: postings, lengths and df/N statistics are exact
  * integers, so probing the read-back store is IDENTICAL to scoring
  * against freshly tokenized relations — and ONE build serves any
  * number of query batches across both rankers. */
class PostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("one build serves both rankers and ad-hoc term batches") {
    val dir = Files.createTempDirectory("graft-postings").toString
    PostingsIndex.build(spark, SF, dir)

    // batch 1: the standard head — must equal the self-contained ops
    assert(rows(PostingsIndex.bm25Against(spark,
        PostingsIndex.standardQuery(spark, dir).select("token"), dir)) ==
      rows(DataOps.bm25Search(spark, SF)))
    assert(rows(PostingsIndex.tfidfAgainst(spark,
        PostingsIndex.standardQuery(spark, dir).select("token"), dir)) ==
      rows(DataOps.tfidfSearch(spark, SF)))

    // batch 2: an ad-hoc term set against the SAME store == the shared
    // scoring stage over freshly tokenized relations
    // "dup" is the fixture's one high-IDF frequent token; "the" is in
    // vocabulary but idf_bits = 0 (scores 0, filtered); the third is
    // out of vocabulary entirely
    val terms = Seq("dup", "the", "nosuchtokenanywhere")
      .toDF("token")
    val dt = DataOps.docTokenCounts(spark, SF).persist()
    val ndocs = spark.read.parquet(s"$SF/documents.parquet")
      .agg(count(lit(1)).as("n"))
    val weights = DataOps.termWeights(
      DataOps.vocabOfCounts(dt)
        .join(terms, Seq("token"), "left_semi"), ndocs)
      .select(col("token"), col("idf_bits"))
    val dls = dt.groupBy(col("doc_id")).agg(sum(col("cnt")).as("dl"))
    val sdl = dls.agg(sum(col("dl")).as("sdl"))
    val wantBm = rows(DataOps.bm25ScoreStage(dt, dls, ndocs, sdl, weights))
    val wantTf = rows(DataOps.tfidfScoreStage(dt, weights))
    assert(rows(PostingsIndex.bm25Against(spark, terms, dir)) == wantBm)
    assert(rows(PostingsIndex.tfidfAgainst(spark, terms, dir)) == wantTf)
    assert(wantBm.nonEmpty && wantTf.nonEmpty)
    dt.unpersist()

    // out-of-vocabulary terms drop out of the weighting entirely
    val w = PostingsIndex.queryWeights(spark, terms, dir)
      .select("token").as[String].collect().toSet
    assert(!w.contains("nosuchtokenanywhere") && w.contains("the"))
  }

  test("rrfIndexed: hybrid fusion off one store == the self-contained fusion") {
    assert(PostingsIndex.rrfIndexed(spark, SF)
      .as[(Long, Long, Long, Long, Long)].collect().toSet ==
      graft.pipeline.DataOps.rrfFusion(spark, SF)
        .as[(Long, Long, Long, Long, Long)].collect().toSet)
  }

  test("bm25ServeAgainst: the store answers a multi-query batch == self-contained serve") {
    val dir = Files.createTempDirectory("graft-postings-serve").toString
    PostingsIndex.build(spark, SF, dir)
    // the standard 2-query batch, regenerated purely from the store
    val ndocs = spark.read.parquet(s"$dir/stats").select(col("n"))
    val qs = graft.pipeline.DataOps.standardServeQueries(
      spark.read.parquet(s"$dir/vocab"), ndocs)
    val got = PostingsIndex.bm25ServeAgainst(spark,
        qs.select("q_id", "token"), dir)
      .collect().map(_.toSeq).toSet
    val want = graft.pipeline.DataOps.bm25Serve(spark, SF)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // ad-hoc batch: OOV-only query answers empty, mixed query answers
    val adhoc = Seq((7L, "dup"), (7L, "the"), (9L, "nosuchtokenanywhere"))
      .toDF("q_id", "token")
    val rows = PostingsIndex.bm25ServeAgainst(spark, adhoc, dir)
      .select("q_id").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ == 7L))
  }

  test("appendBatch: incremental merge is batch-decomposition-invariant == full build") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    // full build in one shot
    val full = Files.createTempDirectory("graft-postings-full").toString
    PostingsIndex.buildFrom(spark, d, full)
    // build evens, then land the odds in TWO separate batches
    val incr = Files.createTempDirectory("graft-postings-incr").toString
    PostingsIndex.buildFrom(spark, d.where(col("doc_id") % 2 === 0), incr)
    PostingsIndex.appendBatch(spark, d.where(col("doc_id") % 4 === 1), incr)
    PostingsIndex.appendBatch(spark, d.where(col("doc_id") % 4 === 3), incr)
    // every store relation merged bit-identically
    for (rel <- Seq("postings", "doclen", "vocab", "stats")) {
      val a = spark.read.parquet(s"$full/$rel")
        .collect().map(_.toSeq).toSet
      val b = spark.read.parquet(s"$incr/$rel")
        .collect().map(_.toSeq).toSet
      assert(a == b, rel)
    }
    // and the served answers agree, standard head and ad-hoc batch
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(PostingsIndex.bm25Against(spark,
        PostingsIndex.standardQuery(spark, incr).select("token"), incr)) ==
      rows(DataOps.bm25Search(spark, SF)))
    val adhoc = Seq("dup").toDF("token")
    assert(rows(PostingsIndex.bm25Against(spark, adhoc, incr)) ==
      rows(PostingsIndex.bm25Against(spark, adhoc, full)))
  }

  test("removeBatch inverts appendBatch bit-for-bit; compact preserves contents") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text"))
    def rels(dir: String) =
      Seq("postings", "doclen", "vocab", "stats").map { rel =>
        rel -> spark.read.parquet(s"$dir/$rel")
          .collect().map(_.toSeq).toSet
      }.toMap
    // S = evens-only store
    val base = Files.createTempDirectory("graft-postings-base").toString
    PostingsIndex.buildFrom(spark, d.where(col("doc_id") % 2 === 0), base)
    val want = rels(base)
    // append the odds, then forget them: remove(append(S, B), B) == S
    val roundTrip =
      Files.createTempDirectory("graft-postings-rt").toString
    PostingsIndex.buildFrom(spark, d.where(col("doc_id") % 2 === 0),
      roundTrip)
    PostingsIndex.appendBatch(spark, d.where(col("doc_id") % 2 === 1),
      roundTrip)
    PostingsIndex.removeBatch(spark,
      d.where(col("doc_id") % 2 === 1).select("doc_id"), roundTrip)
    assert(rels(roundTrip) == want)
    // nothing of the victims remains anywhere
    val victims = d.where(col("doc_id") % 2 === 1)
      .select("doc_id").as[Long].collect().toSet
    for (rel <- Seq("postings", "doclen")) {
      assert(spark.read.parquet(s"$roundTrip/$rel")
        .select("doc_id").as[Long].collect().forall(!victims.contains(_)),
        rel)
    }
    // telemetry tracks the lifecycle: the round-tripped store reports
    // exactly the evens-only numbers
    def stats(dir: String) =
      PostingsIndex.statsOf(spark, dir).collect().map(_.toSeq).toSet
    assert(stats(roundTrip) == stats(base))
    // compaction: contents identical, corpus-sized relations in 1 file
    PostingsIndex.compact(spark, roundTrip)
    assert(rels(roundTrip) == want)
    for (rel <- Seq("postings", "doclen")) {
      val files = new java.io.File(s"$roundTrip/$rel").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$rel has $files files after compact")
    }
  }

  test("bucketed postings layout: pruned probe == directory probe, token aggs shuffle-free") {
    val dir = Files.createTempDirectory("graft-postings-bkt").toString
    PostingsIndex.build(spark, SF, dir)
    try {
      PostingsIndex.writeBucketedPostings(spark, dir, "g_postings_bkt", 8)
      // bucketed table == the directory relation, row for row
      assert(spark.table("g_postings_bkt").collect().map(_.toSeq).toSet ==
        spark.read.parquet(s"$dir/postings").collect().map(_.toSeq).toSet)
      // a literal-term probe returns exactly the directory store's
      // answer for the same ad-hoc terms
      val terms = spark.read.parquet(s"$dir/vocab")
        .orderBy(col("df").desc, col("token").asc).limit(2)
        .select("token").as[String].collect().toSeq
      val bucketed = PostingsIndex.bm25AgainstBucketed(spark, terms,
        "g_postings_bkt", dir)
      assert(bucketed.collect().map(_.toSeq).toSet ==
        PostingsIndex.bm25Against(spark, terms.toDF("token"), dir)
          .collect().map(_.toSeq).toSet)
      // ... and its scan PRUNES to the terms' buckets — the
      // posting-list-lookup cost, visible in the plan
      val scan = bucketed.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount"),
        s"no bucket pruning in:\n$scan")
      // the pre-shuffle is paid at write time: a token-keyed aggregate
      // over the bucketed table needs NO exchange (the scan already
      // carries HashPartitioning(token))
      val agg = spark.table("g_postings_bkt")
        .groupBy("token").agg(sum("cnt"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg shuffled:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_postings_bkt")
      ()
    }
  }
}
