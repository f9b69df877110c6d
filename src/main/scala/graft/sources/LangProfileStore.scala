package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.DataOps

/**
 * PERSISTENT Cavnar-Trenkle language-profile store — the
 * train-offline/score-online form of [[DataOps.langIdNgram]] (the K4
 * [[MinhashIndex]] pattern applied to a trained classifier): a
 * production ingest path never re-trains its language profiles per
 * batch; the L·[[DataOps.CtProfK]] profile relation is written ONCE
 * from a labeled corpus and every later batch (or micro-batch —
 * [[graft.streaming.StreamingOps.classifyAgainstStream]]) classifies
 * against the read-back store.
 *
 * Determinism: a document's prediction depends only on its own trigram
 * profile and the stored relation, so store-scored results are
 * IDENTICAL to the self-trained batch query whenever the store was
 * built from the same corpus — pinned in StreamingSpec (stream over
 * two micro-batches ≡ [[DataOps.langIdNgram]]).
 *
 * Layout (`storeDir/profiles`): (plang, h, lrank) plain parquet —
 * KB-sized (L·K rows of three longs/strings), broadcast on every
 * probe; at cluster scale the store is trivially replicated.
 */
object LangProfileStore {

  /** Train (overwrite) the profile store from the sf corpus. */
  def build(spark: SparkSession, sfDir: String, storeDir: String): Unit = {
    val gc = DataOps.ctGramCounts(spark,
      spark.read.parquet(s"$sfDir/documents.parquet")).persist()
    DataOps.ctProfilesFromCounts(gc)
      .write.mode("overwrite").parquet(s"$storeDir/profiles")
    gc.unpersist()
    ()
  }

  /** Classify a (doc_id, lang, text)-shaped frame against the stored
    * profiles — per-doc work only; the store side is READ, never
    * recomputed. Output = [[DataOps.langIdNgram]]'s shape. */
  def classifyAgainst(spark: SparkSession, d: DataFrame,
      storeDir: String): DataFrame =
    DataOps.ctScoreCounts(DataOps.ctGramCounts(spark, d),
      spark.read.parquet(s"$storeDir/profiles"))
}
