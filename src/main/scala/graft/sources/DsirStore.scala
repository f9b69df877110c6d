package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.pipeline.DataOps

/**
 * PERSISTENT DSIR importance-weight model — the train-offline /
 * score-online form of [[DataOps.dsirWeights]] (the K6
 * [[LangProfileStore]] pattern applied to data selection): a production
 * ingest path trains the target/raw hashed-bigram bucket statistics
 * ONCE from a reference corpus and scores every later batch (or
 * micro-batch — [[graft.streaming.StreamingOps.dsirScoreStream]])
 * against the frozen relation, exactly how DSIR (Xie et al. 2023) is
 * deployed: the importance model is fitted on the target/raw snapshot,
 * then applied to the full raw stream.
 *
 * Determinism: a document's weight depends only on its own hashed
 * bigrams and the stored statistics, so store-scored results are
 * IDENTICAL to the self-trained batch query whenever the store was
 * built from the same corpus — pinned in DataOpsSpec (one build, two
 * disjoint scoring batches) and StreamingSpec (two micro-batches ≡
 * batch).
 *
 * Layout (`storeDir/stats`): (b, raw_cnt, tgt_cnt) plain parquet —
 * at most [[DataOps.DsirBuckets]] rows of three longs, KB-sized at ANY
 * corpus scale (the feature space is fixed), broadcast on every score.
 */
object DsirStore {

  /** Train (overwrite) the bucket-statistics store from the sf corpus. */
  def build(spark: SparkSession, sfDir: String, storeDir: String): Unit = {
    val dbl = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val withB = DataOps.dsirBuckets(spark, dbl.select("doc_id", "text"))
      .join(dbl.select(col("doc_id"), col("lang")), Seq("doc_id"))
    DataOps.dsirStatsFromBuckets(withB)
      .write.mode("overwrite").parquet(s"$storeDir/stats")
    ()
  }

  /** Score a (doc_id, text)-shaped frame against the stored statistics
    * — per-doc work only; the store side is READ, never recomputed.
    * Output = [[DataOps.dsirWeights]]'s shape. */
  def scoreAgainst(spark: SparkSession, d: DataFrame,
      storeDir: String): DataFrame =
    DataOps.dsirScore(d.select(col("doc_id")),
      DataOps.dsirBuckets(spark, d),
      spark.read.parquet(s"$storeDir/stats"))

  /** Registry form — the full round-trip: build (write) the store for
    * the sf directory, then score the same corpus purely from the
    * read-back relation. Result ≡ [[DataOps.dsirWeights]] (same
    * oracle): nothing may be lost between the trained model and the
    * serving store. */
  def dsirStored(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: audit the score plan over fresh
      // model relations (plan-identical to the store read by design).
      val dbl = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val withB = DataOps.dsirBuckets(spark, d)
        .join(dbl.select(col("doc_id"), col("lang")), Seq("doc_id"))
      return DataOps.dsirScore(d.select(col("doc_id")),
        DataOps.dsirBuckets(spark, d),
        DataOps.dsirStatsFromBuckets(withB))
    }
    val dir = StoreDirs.tmpStoreDir("graft-dsir-store", sfDir)
    build(spark, sfDir, dir)
    scoreAgainst(spark, d, dir)
  }
}
