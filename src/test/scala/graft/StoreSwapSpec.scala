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
