package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{CorpusSink, PqIndex, SqIndex, StoreDirs}
import graft.streaming.IngestPipeline

/** Durability pins for the store-swap and ingest-lease discipline:
  * [[StoreDirs.replaceParquet]] must recover a swap a crash left
  * half-done, corpus-partition rewrites must stage under names Spark
  * partition discovery SKIPS (a crash leftover can never resurrect
  * forgotten documents as a bogus partition), the vector-store
  * bootstrap must replay idempotently, and a second concurrent ingest
  * writer on one outDir must fail loudly before any store mutates. */
class StoreSwapSpec extends SparkSpec {

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("replaceParquet entry recovery restores a swap that died between renames") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-swap").toString + "/rel"
    StoreDirs.replaceParquet(Seq(1L, 2L).toDF("v"), dir)
    // simulate a crash between rename(dir, dir.old) and
    // rename(staging, dir): the complete old relation is parked at
    // .old, nothing is live
    val f = fs(dir)
    assert(f.rename(new Path(dir), new Path(dir + ".old")))
    assert(!f.exists(new Path(dir)))
    // the NEXT replace recovers first (its input may scan `dir`), then
    // swaps in the new contents
    val recovered = spark.read // lineage built AFTER recovery runs
    StoreDirs.replaceParquet(Seq(7L, 8L, 9L).toDF("v"), dir)
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq ==
      Seq(7L, 8L, 9L))
    assert(!f.exists(new Path(dir + ".old")) &&
      !f.exists(new Path(dir + ".staging")))
    val _ = recovered
  }

  test("corpus partition staging is invisible to readers; recovery sweep restores a parked partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-swap-corpus").toString
    val docs = Seq(
      (1L, "de", "ein kleines deutsches dokument mit text"),
      (2L, "en", "a small english document with some text"))
      .toDF("doc_id", "lang", "clean_text")
    CorpusSink.appendCurated(docs, s"$dir/corpus")
    // plant crash leftovers shaped like the hidden staging names — and
    // like the OLD unhidden sibling names would have been
    val junk = Seq((9L, "junk text that must never resurrect"))
      .toDF("doc_id", "clean_text")
    junk.write.parquet(s"$dir/corpus/.staging_lang=fr")
    junk.write.parquet(s"$dir/corpus/.old_lang=de") // live de exists → obsolete copy
    // Spark partition discovery must skip both: no bogus partitions,
    // no resurrected rows
    val read = spark.read.parquet(s"$dir/corpus")
    assert(read.count() == 2L)
    assert(read.select("lang").distinct().as[String].collect().toSet ==
      Set("de", "en"))
    // park the en partition at its _old_ name (crash between renames)
    val f = fs(dir)
    assert(f.rename(new Path(s"$dir/corpus/lang=en"),
      new Path(s"$dir/corpus/.old_lang=en")))
    CorpusSink.recoverPartitionSwaps(spark, s"$dir/corpus")
    val after = spark.read.parquet(s"$dir/corpus")
    assert(after.count() == 2L) // en restored, de kept its live copy
    assert(!f.exists(new Path(s"$dir/corpus/.old_lang=de")) &&
      !f.exists(new Path(s"$dir/corpus/.old_lang=en")) &&
      !f.exists(new Path(s"$dir/corpus/.staging_lang=fr")))
    // and deleteDocs end-to-end still prunes to the right partition
    CorpusSink.deleteDocs(spark, Seq(1L).toDF("doc_id"), s"$dir/corpus")
    assert(spark.read.parquet(s"$dir/corpus")
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("vector-store buildFrom replays idempotently (the bootstrap-intent contract)") {
    val dir = Files.createTempDirectory("graft-swap-boot").toString
    val v = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(256)
      .select(col("vec_id"),
        graft.functions.MicroVecExpr.micro(spark, col("embedding"))
          .as("em"))
      .withColumn("nrm",
        graft.functions.VecDotExpr.dot(spark, col("em"), col("em")))
    def rel(p: String) =
      spark.read.parquet(s"$dir/$p").collect().map(_.toSeq)
    PqIndex.buildFrom(spark, v, s"$dir/pq")
    SqIndex.buildFrom(spark, v, s"$dir/sq")
    val (codes, cells, recon) =
      (rel("pq/codes").toSet, rel("pq/cells").toSet,
        rel("sq/recon").toSet)
    assert(rel("pq/codes").size == codes.size) // no dup rows to hide in a set
    // a crash after buildFrom but before the sink marker replays the
    // SAME build (the recorded intent) — which must reproduce the
    // store exactly, never double-code
    PqIndex.buildFrom(spark, v, s"$dir/pq")
    SqIndex.buildFrom(spark, v, s"$dir/sq")
    assert(rel("pq/codes").length == codes.size &&
      rel("pq/codes").toSet == codes)
    assert(rel("pq/cells").length == cells.size &&
      rel("pq/cells").toSet == cells)
    assert(rel("sq/recon").length == recon.size &&
      rel("sq/recon").toSet == recon)
  }

  test("exactly-once applies: kill-and-replay between any append and its marker replays to the sequential result") {
    import graft.pipeline.DataOps
    import graft.sources.{DsirStore, LangProfileStore, MinhashIndex,
      PositionsIndex, PostingsIndex}
    val SF = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 40)
    val evens = docs.where(col("doc_id") % 2 === 0)
    val odds = docs.where(col("doc_id") % 2 === 1)
    val labeled = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
      .where(col("doc_id") < 40)
    def rels(dir: String, names: Seq[String]) = names.map { r =>
      r -> spark.read.parquet(s"$dir/$r").collect().map(_.toSeq).toSet
    }.toMap
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val tag = "7"

    // ---- text stores: control (sequential) vs completed-apply replay
    val matrix: Seq[(String, Seq[String],
        (org.apache.spark.sql.DataFrame, String) => Unit,
        (org.apache.spark.sql.DataFrame, String, String) => Unit)] = Seq(
      ("mh", Seq("shingles", "bands"),
        (b, d) => MinhashIndex.build(spark, b, d),
        (b, d, t) => MinhashIndex.appendBatch(spark, b, d, t)),
      ("po", Seq("postings", "doclen", "vocab", "stats"),
        (b, d) => PostingsIndex.buildFrom(spark, b, d),
        (b, d, t) => PostingsIndex.appendBatch(spark, b, d, t)),
      ("ps", Seq("positions"),
        (b, d) => PositionsIndex.buildFrom(spark, b, d),
        (b, d, t) => PositionsIndex.appendBatch(spark, b, d, t)))
    matrix.foreach { case (name, names, build, append) =>
      val control = tmp(s"graft-eo-$name-c")
      build(evens, control); append(odds, control, null)
      val replay = tmp(s"graft-eo-$name-r")
      build(evens, replay); append(odds, replay, tag)
      // the crash window: apply completed, marker never touched —
      // the ingest job re-runs the whole apply with the same tag
      append(odds, replay, tag)
      assert(rels(replay, names) == rels(control, names), name)
    }

    // ---- partial crash INSIDE a multi-relation apply: postings +
    // doclen landed (witnessed), vocab/stats did not
    val control = tmp("graft-eo-part-c")
    PostingsIndex.buildFrom(spark, evens, control)
    PostingsIndex.appendBatch(spark, odds, control)
    val part = tmp("graft-eo-part-r")
    PostingsIndex.buildFrom(spark, evens, part)
    val dt = DataOps.docTokenCountsOf(spark, odds)
    StoreDirs.appendOnce(dt, s"$part/postings", tag)
    StoreDirs.appendOnce(dt.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("dl")), s"$part/doclen", tag)
    PostingsIndex.appendBatch(spark, odds, part, tag) // the replay
    assert(rels(part, Seq("postings", "doclen", "vocab", "stats")) ==
      rels(control, Seq("postings", "doclen", "vocab", "stats")))

    // ---- derived-relation replay: counts merged+witnessed, crash
    // before profiles — the replay must derive profiles from the
    // POST-merge counts, not double-merge the batch
    val lc = tmp("graft-eo-lang-c")
    LangProfileStore.buildFrom(spark,
      labeled.where(col("doc_id") % 2 === 0), lc)
    LangProfileStore.appendBatch(spark,
      labeled.where(col("doc_id") % 2 === 1), lc)
    val lr = tmp("graft-eo-lang-r")
    LangProfileStore.buildFrom(spark,
      labeled.where(col("doc_id") % 2 === 0), lr)
    StoreDirs.mergeOnce(spark, s"$lr/counts", tag)(
      spark.read.parquet(s"$lr/counts")
        .unionByName(DataOps.ctLangCounts(DataOps.ctGramCounts(spark,
          labeled.where(col("doc_id") % 2 === 1))))
        .groupBy(col("lang"), col("h")).agg(sum(col("c")).as("c")))
    LangProfileStore.appendBatch(spark,
      labeled.where(col("doc_id") % 2 === 1), lr, tag) // the replay
    assert(rels(lr, Seq("counts", "profiles")) ==
      rels(lc, Seq("counts", "profiles")))

    // ---- model-store merge + vector stores: completed-apply replays
    val dc = tmp("graft-eo-dsir-c"); val dr = tmp("graft-eo-dsir-r")
    DsirStore.buildFrom(spark, labeled.where(col("doc_id") % 2 === 0), dc)
    DsirStore.appendBatch(spark, labeled.where(col("doc_id") % 2 === 1), dc)
    DsirStore.buildFrom(spark, labeled.where(col("doc_id") % 2 === 0), dr)
    DsirStore.appendBatch(spark,
      labeled.where(col("doc_id") % 2 === 1), dr, tag)
    DsirStore.appendBatch(spark,
      labeled.where(col("doc_id") % 2 === 1), dr, tag)
    assert(rels(dr, Seq("stats")) == rels(dc, Seq("stats")))
    val v = DataOps.emb(spark, SF).where(col("vec_id") < 64)
    val qc = tmp("graft-eo-pq-c"); val qr = tmp("graft-eo-pq-r")
    PqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), qc)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), qc)
    PqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), qr)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), qr, tag)
    PqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), qr, tag)
    assert(rels(qr, Seq("codebook", "codes", "centroids", "cells")) ==
      rels(qc, Seq("codebook", "codes", "centroids", "cells")))
    val sc = tmp("graft-eo-sq-c"); val sr = tmp("graft-eo-sq-r")
    SqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), sc)
    SqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), sc)
    SqIndex.buildFrom(spark, v.where(col("vec_id") % 2 === 0), sr)
    SqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), sr, tag)
    SqIndex.appendBatch(spark, v.where(col("vec_id") % 2 === 1), sr, tag)
    assert(rels(sr, Seq("recon")) == rels(sc, Seq("recon")))

    // ---- plain + partitioned ledger appends: a replayed appendOnce
    // (and a partial attempt replayed) never duplicates rows
    import spark.implicits._
    val flat = tmp("graft-eo-flat") + "/dups"
    StoreDirs.appendOnce(Seq(1L, 2L).toDF("doc_id"), flat, "0")
    StoreDirs.appendOnce(Seq(3L, 4L).toDF("doc_id"), flat, "1")
    StoreDirs.appendOnce(Seq(3L, 4L).toDF("doc_id"), flat, "1")
    assert(spark.read.parquet(flat).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    val corp = tmp("graft-eo-corp") + "/corpus"
    val b0 = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    CorpusSink.appendCurated(b0, corp, tag = "0")
    val b1 = Seq((3L, "en"), (4L, "fr")).toDF("doc_id", "lang")
    CorpusSink.appendCurated(b1, corp, tag = "1")
    CorpusSink.appendCurated(b1, corp, tag = "1")
    assert(spark.read.parquet(corp).select("doc_id", "lang")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr")))
  }

  test("markers carry content; create-if-absent refuses an existing marker") {
    val dir = Files.createTempDirectory("graft-swap-marker").toString
    StoreDirs.writeMarker(spark, s"$dir/m", "build", overwrite = false)
    assert(StoreDirs.readMarker(spark, s"$dir/m") == "build")
    intercept[java.io.IOException] {
      StoreDirs.writeMarker(spark, s"$dir/m", "append",
        overwrite = false)
    }
    assert(StoreDirs.readMarker(spark, s"$dir/m") == "build")
  }

  test("a second concurrent ingest writer fails loudly before any store mutates") {
    val dir = Files.createTempDirectory("graft-swap-lease").toString
    IngestPipeline.acquireLease(spark, dir, "writer-a")
    // re-entrant for the same writer (a restarted pipeline resumes)
    IngestPipeline.acquireLease(spark, dir, "writer-a")
    val e = intercept[IllegalStateException] {
      IngestPipeline.acquireLease(spark, dir, "writer-b")
    }
    assert(e.getMessage.contains("leased by writer 'writer-a'"))
    // nothing under outDir but the lock — the refusal came first
    assert(fs(dir).listStatus(new Path(dir)).map(_.getPath.getName)
      .toSet == Set("_lock"))
  }

  test("start() sweeps committed-batch staging leftovers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-swap-sweep").toString
    Seq(1L).toDF("doc_id").write.parquet(s"$dir/staging/3/curated")
    Seq(2L).toDF("doc_id").write.parquet(s"$dir/staging/4/curated")
    StoreDirs.touchMarker(spark, s"$dir/committed/3")
    IngestPipeline.sweepCommittedStaging(spark, dir)
    val left = fs(dir).listStatus(new Path(s"$dir/staging"))
      .map(_.getPath.getName).toSet
    assert(left == Set("4")) // committed batch swept, in-flight kept
  }
}
