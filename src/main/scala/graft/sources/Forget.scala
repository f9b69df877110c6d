package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.DataOps

/**
 * COMPOSED RIGHT-TO-BE-FORGOTTEN — one `forget(docIds)` call driving
 * every surface a published document touches: the lang-partitioned
 * corpus ([[CorpusSink.deleteDocs]], partition-pruned rewrite), the K9
 * search index ([[PostingsIndex.removeBatch]] — postings, lengths,
 * vocabulary decrements, query-head statistics) and the K4 dedup index
 * ([[MinhashIndex.removeBatch]] — shingles, band buckets). A real
 * deletion request is not "remove from one store": a document that
 * stays BM25-retrievable, keeps matching as a near-dup corpus member,
 * or survives in a training shard after its corpus row is gone has not
 * been forgotten.
 *
 * The request is CONTRACT-GUARDED once, centrally (the guard the
 * per-store `removeBatch`es document but cannot afford to re-run each):
 * duplicate-free, and every id actually published — a silently-ignored
 * id (or one subtracted twice from the vocab/stats sums) would corrupt
 * the stores' additive state.
 *
 * Registry proof (three entries over ONE composed store set, built +
 * forgotten once per JVM): `corpusForget` hash-audits the surviving
 * published corpus per language against a survivors-only rollup;
 * `forgetSearch` probes the maintained postings store ≡ the
 * [[PostingsIndex.bm25Removed]] oracle (a from-scratch survivors-only
 * build); `forgetDedup` probes the maintained dedup store with the
 * victims as a fresh snapshot ≡ the `dedupIndexed` oracle (no victim
 * may self-match — its bands are gone).
 *
 * 100 TB shape: the id set broadcasts everywhere (deletion batches are
 * small); the corpus rewrite touches only affected lang partitions;
 * the store rewrites are the per-store scan-and-filter costs already
 * documented on their `removeBatch`es. Nothing here adds a shuffle
 * beyond the members'.
 */
object Forget {

  /** Forget `docIds` across the corpus + both stores. Contract: ids
    * duplicate-free and ⊆ the published corpus — asserted HERE, once
    * (two bounded jobs over the broadcast-sized request), before any
    * store mutates, so a bad request fails atomically instead of
    * half-applying. */
  def forget(spark: SparkSession, docIds: DataFrame, corpusDir: String,
      postingsDir: String, minhashDir: String,
      positionsDir: Option[String] = None): Unit = {
    val ids = docIds.select(col("doc_id")).localCheckpoint(true)
    val n = ids.count()
    require(n == ids.distinct().count(),
      "forget request contains duplicate doc_ids — each id must appear " +
        "exactly once (the stores' removal decrements are additive)")
    val unpublished = ids
      .join(spark.read.parquet(corpusDir).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .count()
    require(unpublished == 0,
      s"forget request names $unpublished doc_ids not in the published " +
        "corpus — removal is only defined for indexed documents")
    CorpusSink.deleteDocs(spark, ids, corpusDir)
    PostingsIndex.removeBatch(spark, ids, postingsDir)
    MinhashIndex.removeBatch(spark, ids, minhashDir)
    positionsDir.foreach(PositionsIndex.removeBatch(spark, ids, _))
    ()
  }

  /** One composed publish+build+forget per (JVM, sf directory), shared
    * by the three registry entries: corpus published lang-partitioned,
    * both stores built over the full corpus, then ONE [[forget]] of
    * the odd doc_ids. Returns the composed store root. */
  private def forgottenDirs(spark: SparkSession, sfDir: String): String = {
    val dir = StoreDirs.tmpStoreDir("graft-forget", sfDir)
    if (built.add(dir)) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      CorpusSink.appendCurated(docs, s"$dir/corpus")
      PostingsIndex.buildFrom(spark,
        docs.select(col("doc_id"), col("text")), s"$dir/postings")
      MinhashIndex.build(spark,
        docs.select(col("doc_id"), col("text")), s"$dir/minhash")
      PositionsIndex.buildFrom(spark,
        docs.select(col("doc_id"), col("text")), s"$dir/positions")
      forget(spark,
        docs.where(col("doc_id") % 2 === 1).select(col("doc_id")),
        s"$dir/corpus", s"$dir/postings", s"$dir/minhash",
        Some(s"$dir/positions"))
    }
    dir
  }

  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Registry entry: the surviving published corpus rolled up per
    * language — read from the REWRITTEN partitions, so a victim
    * surviving any partition (or a survivor lost by the rewrite)
    * breaks count, id-sum or char-sum against the survivors-only
    * oracle. */
  def corpusForget(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: the surviving corpus IS the even
      // half — audit that rollup plan.
      return spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id") % 2 === 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
          sum(length(col("text"))).cast("long").as("sum_chars"))
    }
    spark.read.parquet(s"${forgottenDirs(spark, sfDir)}/corpus")
      .groupBy(col("lang").cast("string").as("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        sum(length(col("text"))).cast("long").as("sum_chars"))
  }

  /** Registry entry: the standard BM25 probe over the composed-forget
    * postings store ≡ a from-scratch survivors-only build (the
    * [[PostingsIndex.bm25Removed]] oracle) — the search surface's
    * proof that the SAME forget call that rewrote the corpus also
    * scrubbed postings, lengths, vocabulary and head statistics. */
  def forgetSearch(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      return PostingsIndex.bm25Removed(spark, sfDir)
    }
    PostingsIndex.probeStandardBm25(spark,
      s"${forgottenDirs(spark, sfDir)}/postings")
  }

  /** Registry entry: the standard phrase probed against the
    * composed-forget positional store ≡ the survivors-filtered
    * [[PositionsIndex.phraseRemoved]] oracle — no forgotten document
    * may still report an exact-phrase hit. */
  def forgetPhrase(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      return PositionsIndex.phraseRemoved(spark, sfDir)
    }
    PositionsIndex.phraseAgainst(spark,
      DataOps.phraseParts(spark,
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))),
      s"${forgottenDirs(spark, sfDir)}/positions")
  }

  /** Registry entry: the victims probed as a fresh snapshot against
    * the composed-forget dedup store ≡ [[MinhashIndex.dedupIndexed]]'s
    * oracle — no victim may self-match (its bands are gone), and the
    * surviving even half must still answer exactly. */
  def forgetDedup(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      return MinhashIndex.dedupRemoved(spark, sfDir)
    }
    MinhashIndex.dedupAgainst(spark,
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .where(col("doc_id") % 2 === 1),
      s"${forgottenDirs(spark, sfDir)}/minhash")
  }
}
