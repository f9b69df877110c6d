package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.DataOps

/**
 * PERSISTENT scalar-quantization vector index — the build-once /
 * query-many form of [[DataOps.annSq]] beside [[PqIndex]]'s PQ store
 * (the K4/K5 pattern at the SQ8 compression tier): the 254×-scaled
 * reconstruction relation is computed ONCE from the corpus and every
 * query batch only probes it.
 *
 * Layout (`indexDir/recon`): (vec_id, r254: array<bigint>) plain
 * parquet of exact integers — the lossless round-trip makes the probe
 * over the store bit-identical to the fresh model (shared
 * [[DataOps.sqProbe]] stage; registry entry `annSqIndexed` proves it
 * against `annSq`'s own oracle, and SqIndexSpec pins one build serving
 * two disjoint query batches).
 *
 * 100 TB notes: `recon` is the only corpus-sized relation (N rows of
 * dim longs — in production SQ ships the int8 codes + 2 scalars and
 * reconstructs in the scan; the engine stores the reconstruction
 * because exact-integer replay is the contract here); queries broadcast
 * over ONE scan of it, and the raw-vector re-read touches shortlist·Q
 * rows only.
 */
object SqIndex {

  /** Quantize the sf directory's embeddings and write (overwrite) the
    * reconstruction relation. */
  def build(spark: SparkSession, sfDir: String, indexDir: String): Unit = {
    DataOps.sqRecon(spark, DataOps.emb(spark, sfDir))
      .write.mode("overwrite").parquet(s"$indexDir/recon")
    ()
  }

  /** Probe-only ANN against the stored reconstruction: NO quantization
    * work. `queries` must carry (q_id, qem, qn) ([[DataOps.annQueries]]
    * shape). */
  def queryAgainst(spark: SparkSession, queries: DataFrame,
      indexDir: String, sfDir: String): DataFrame =
    DataOps.sqProbe(spark, queries,
      spark.read.parquet(s"$indexDir/recon"),
      DataOps.emb(spark, sfDir))

  /** Registry form — the full round-trip: build (write) the store,
    * then answer the standard ANN query set purely from the read-back
    * relation. Result ≡ [[DataOps.annSq]] (same oracle). */
  def annSqIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: audit the probe plan over the
      // fresh reconstruction (plan-identical to the store read).
      return DataOps.sqProbe(spark, DataOps.annQueries(spark, sfDir),
        DataOps.sqRecon(spark, DataOps.emb(spark, sfDir)),
        DataOps.emb(spark, sfDir))
    }
    val dir = StoreDirs.tmpStoreDir("graft-sq-index", sfDir)
    build(spark, sfDir, dir)
    queryAgainst(spark, DataOps.annQueries(spark, sfDir), dir, sfDir)
  }
}
