package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{CorpusSink, MinhashIndex, PostingsIndex}

/**
 * The end-to-end INGEST JOB — the data-pipeline surface in the same
 * runnable-binary form as the reference's sentiment job
 * ([[SentimentPipeline.main]] mirrors SentimentAnalysis.scala:34-227;
 * this main is its curation-side sibling): documents land in a watched
 * directory, each micro-batch flows through the already-pinned stages
 *
 *   curationStream (language-ID ∧ quality ∧ decontamination verdict,
 *     stateless — the gram set rides as one broadcast literal)
 *   → keep filter
 *   → piiRedactStream (mask BEFORE anything persists)
 *   → near-dup probe against the K4 [[MinhashIndex]] store
 *     (per-batch batch-join — zero stream state, the store holds every
 *     heavy relation)
 *   → [[CorpusSink.appendCurated]] (lang-partitioned parquet publish)
 *   → [[PostingsIndex.appendBatch]] (the K9 search index absorbs the
 *     published batch — landed documents become immediately
 *     BM25-searchable, indexed on the same redacted text that was
 *     published; the additive merge is batch-decomposition-invariant,
 *     so the ingest-maintained index ≡ a one-shot build over the
 *     published corpus)
 *
 * with near-dup hits appended to `outDir/dups` as the audit trail.
 * Every stage is stateless or store-backed, so the composed DAG is
 * append-clean and micro-batch-boundary-independent: two batches ≡ one
 * batch ≡ the batch composition on the union (pinned in
 * StreamingSpec).
 *
 * 100 TB shape: the file source admits micro-batches by
 * `maxFilesPerTrigger`; per batch the only shuffles are the probe's
 * band join (against the store, proportional to the BATCH) and the
 * publish `repartition(lang)`; nothing grows with stream length.
 */
object IngestPipeline {

  /** CLI config, [[SentimentPipeline.Config]]-style defaulted args. */
  case class Config(inDir: String = "/tmp/graft-ingest-in",
      sfDir: String = "/root/testdata/sf0.001",
      indexDir: String = "/tmp/graft-ingest-index",
      outDir: String = "/tmp/graft-ingest-out")

  /** Parse `--in/--sf/--index/--out` pairs; unknown flags ignored,
    * defaults kept — ParameterTool-style leniency. */
  def parseArgs(args: Array[String]): Config =
    args.sliding(2, 2).foldLeft(Config()) {
      case (c, Array("--in", v))    => c.copy(inDir = v)
      case (c, Array("--sf", v))    => c.copy(sfDir = v)
      case (c, Array("--index", v)) => c.copy(indexDir = v)
      case (c, Array("--out", v))   => c.copy(outDir = v)
      case (c, _)                   => c
    }

  /** The per-micro-batch tail of the DAG, after the streaming-side
    * curation verdict: keep filter → PII redaction (metadata re-joined
    * on doc_id) → near-dup probe against the store. Returns (curated
    * survivors, dup audit rows). Pure function of (verdict batch,
    * store), so the StreamingSpec batch twin calls it on a static
    * frame. */
  def finishBatch(verdict: DataFrame,
      indexDir: String): (DataFrame, DataFrame) = {
    val kept = verdict.where(col("keep") === 1L)
    val redacted = StreamingOps.piiRedactStream(kept)
      .join(kept.drop("text"), Seq("doc_id"))
    val dups = MinhashIndex.dedupAgainst(verdict.sparkSession,
      redacted.select(col("doc_id"), col("clean_text").as("text")),
      indexDir)
    val survivors = redacted
      .join(dups.select(col("doc_id")).distinct(), Seq("doc_id"),
        "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        col("clean_text"), col("n_redacted"), col("lang_pred"),
        col("quality_micro"))
    (survivors, dups)
  }

  /** Compose and start the DAG over a (doc_id, text, lang, source, ...)
    * document stream. The curation verdict runs IN-STREAM (stateless,
    * its benchmark gram literal is built once at plan time); the dedup
    * probe, the partitioned publish and the search-index merge run per
    * micro-batch. The K9 postings store under `outDir/index` is seeded
    * EMPTY up front, then absorbs each published batch additively —
    * after any number of batches it is bit-identical to a one-shot
    * build over the published corpus (the [[PostingsIndex.appendBatch]]
    * invariance, pinned in StreamingSpec). */
  def start(docStream: DataFrame, sfDir: String, indexDir: String,
      outDir: String): StreamingQuery = {
    val spark = docStream.sparkSession
    val searchDir = s"$outDir/index"
    PostingsIndex.buildFrom(spark,
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text")), searchDir)
    StreamingOps.curationStream(docStream, sfDir).writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val (curated, dups) = finishBatch(batch.toDF(), indexDir)
        dups.write.mode("append").parquet(s"$outDir/dups")
        val published = curated.persist()
        CorpusSink.appendCurated(published, s"$outDir/corpus")
        PostingsIndex.appendBatch(batch.sparkSession,
          published.select(col("doc_id"),
            col("clean_text").as("text")), searchDir)
        published.unpersist()
        ()
      }
      .queryName("ingestPipeline")
      .start()
  }

  /** The job form: bootstrap the dedup store from the existing corpus
    * if absent (index-once), then watch `--in` for landing document
    * parquet and curate until terminated. */
  def main(args: Array[String]): Unit = {
    val config = parseArgs(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("Graft Ingest")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    val corpus = spark.read
      .parquet(s"${config.sfDir}/documents.parquet")
    if (!new java.io.File(s"${config.indexDir}/bands").exists()) {
      MinhashIndex.build(spark,
        corpus.select(col("doc_id"), col("text")), config.indexDir)
    }
    val docStream = spark.readStream
      .schema(corpus.schema)
      .option("maxFilesPerTrigger", 8)
      .parquet(config.inDir)
    start(docStream, config.sfDir, config.indexDir, config.outDir)
    spark.streams.awaitAnyTermination()
  }
}
