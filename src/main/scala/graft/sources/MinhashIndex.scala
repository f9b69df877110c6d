package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.nlp.NlpFunctions.MICRO
import graft.pipeline.DataOps

/**
 * PERSISTENT MinHash index — the incremental-ingest form of
 * [[DataOps.dedupMinhash]]: a 100 TB corpus cannot re-shingle itself
 * every time a crawl snapshot lands, so the corpus's shingle hashes and
 * LSH band buckets are written ONCE and each new snapshot dedups
 * against the store — the standard two-phase incremental dedup (new-vs-
 * corpus here; new-vs-new via [[DataOps.dedupMinhash]] over the
 * snapshot alone).
 *
 * Determinism: a document's signature/bands depend only on its own
 * text, so the banded candidates of a (new, indexed) pair are
 * IDENTICAL to what the batch operator would produce over the union —
 * pinned in MinhashIndexSpec against [[DataOps.dedupMinhash]]'s cross
 * pairs. The exact-Jaccard verify runs on the stored 60-bit shingle
 * hashes rather than shingle strings (what makes the store compact:
 * 8 bytes per shingle, no text retained); a 2^-60 hash collision can
 * only merge two shingles — the same with-high-probability contract as
 * the band-bucket hash, documented on [[DataOps.dedupMinhash]].
 *
 * Layout (`indexDir/`): `shingles/` = (doc_id, hp) and `bands/` =
 * (doc_id, bh), plain parquet. 100 TB notes: both relations shuffle
 * only hashes; at cluster scale write `bands` bucketed by `bh` (and
 * `shingles` by `doc_id`) so the snapshot probe co-locates without a
 * corpus-side shuffle — the layout knob, not a plan change.
 */
object MinhashIndex {

  /** Build (overwrite) the index from a (doc_id, text) corpus frame. */
  def build(spark: SparkSession, corpus: DataFrame,
      indexDir: String): Unit = {
    val sh = DataOps.shingleHashes(spark, corpus).persist()
    StoreDirs.replaceParquet(sh, s"$indexDir/shingles")
    StoreDirs.replaceParquet(DataOps.minhashBandsOf(sh),
      s"$indexDir/bands")
    sh.unpersist()
  }

  /** INCREMENTAL MAINTENANCE — append a landed (doc_id, text) batch
    * (doc_ids disjoint from the store's) to an existing index without
    * re-shingling the corpus (the K9 [[PostingsIndex.appendBatch]]
    * discipline applied to the dedup store): a document's shingle
    * hashes and band buckets depend only on its OWN text, so both
    * relations append on disjoint keys — purely additive, and any
    * batch decomposition yields the identical store CONTENTS (pinned
    * in MinhashIndexSpec; hash-audited by the `dedupIncremental`
    * registry entry, whose two-step store must answer a probe exactly
    * like a one-shot build). This is what lets a continuous ingest
    * job ([[graft.streaming.IngestPipeline]]) dedup batch N+1 against
    * every batch ≤ N, not just the bootstrap corpus.
    *
    * 100 TB shape: work is proportional to the BATCH (one shingle
    * pass + one 48-min aggregate); the corpus-sized relations are
    * never read. Each append lands one parquet file set — [[compact]]
    * folds the pileup. */
  def appendBatch(spark: SparkSession, batch: DataFrame,
      indexDir: String, tag: String = null): Unit = {
    val sh = DataOps.shingleHashes(spark, batch).persist()
    StoreDirs.appendOnce(sh, s"$indexDir/shingles", tag)
    StoreDirs.appendOnce(DataOps.minhashBandsOf(sh),
      s"$indexDir/bands", tag)
    sh.unpersist()
    ()
  }

  /** COMPACTION — rewrite both relations into `numFiles`-file layout
    * (shingles sorted by (doc_id, h), bands by (bh, doc_id) — the
    * probe keys): a long-lived store accumulates one file set per
    * [[appendBatch]] and the small-files pileup eventually dominates
    * probe open costs. Contents are bit-identical before and after
    * (pinned in MinhashIndexSpec); at cluster scale the same rewrite
    * buckets bands by `bh` and shingles by `doc_id` (the layout knob
    * of the store scaladoc). */
  def compact(spark: SparkSession, indexDir: String,
      numFiles: Int = 1): Unit = {
    val sh = spark.read.parquet(s"$indexDir/shingles")
      .repartition(numFiles)
      .sortWithinPartitions(col("doc_id"), col("h"))
    StoreDirs.replaceParquet(sh, s"$indexDir/shingles")
    val bands = spark.read.parquet(s"$indexDir/bands")
      .repartition(numFiles)
      .sortWithinPartitions(col("bh"), col("doc_id"))
    StoreDirs.replaceParquet(bands, s"$indexDir/bands")
    ()
  }

  /** STORE TELEMETRY — the K9 [[PostingsIndex.statsOf]] discipline on
    * the dedup store: one row (n_docs, n_shingles, n_band_rows,
    * n_buckets), every number read off the STORE relations (no corpus
    * access). As a registry entry (`minhashStats`) it is an INTEGRITY
    * AUDIT: the oracle recomputes the same numbers from the documents
    * table, so any drift between the maintained store and corpus
    * truth — a missed append, a double append, a half-applied remove —
    * breaks the hash. (n_buckets counts distinct 64-bit band hashes vs
    * the oracle's distinct (band, key) strings — equal under the
    * store's documented whp contract.) */
  def statsOf(spark: SparkSession, indexDir: String): DataFrame = {
    val sh = spark.read.parquet(s"$indexDir/shingles")
    val bands = spark.read.parquet(s"$indexDir/bands")
    sh.agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_shingles"))
      .crossJoin(broadcast(bands.agg(
        count(lit(1)).as("n_band_rows"),
        count_distinct(col("bh")).as("n_buckets"))))
  }

  /** One store build+mutate per (JVM, directory) — the K9 guard: the
    * lifecycle entries' mutation half re-run per call would only
    * rebuild the identical store (build overwrites), so later registry
    * calls probe, never re-mutate. */
  private val built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Registry form of the telemetry: build the full-corpus store once,
    * read the one-row health readout purely from it. */
  def minhashStats(spark: SparkSession, sfDir: String): DataFrame = {
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: same aggregates over fresh
      // relations (plan-identical to the store read by design).
      val sh = DataOps.shingleHashes(spark,
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text")))
      return sh.agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_shingles"))
        .crossJoin(broadcast(DataOps.minhashBandsOf(sh).agg(
          count(lit(1)).as("n_band_rows"),
          count_distinct(col("bh")).as("n_buckets"))))
    }
    val dir = StoreDirs.tmpStoreDir("graft-mh-stats", sfDir)
    if (built.add(dir)) {
      build(spark, spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")), dir)
    }
    statsOf(spark, dir)
  }

  /** Registry form of the INCREMENTAL path (the `bm25Incremental`
    * discipline on the dedup store): build the index from the
    * doc_id%3==0 third of the corpus, [[appendBatch]] the %3==1 third
    * as "the landed batch", then dedup the %3==2 third against the
    * two-step store. Result ≡ a one-shot build over both thirds (the
    * oracle replays the split definitionally: new = %3==2, indexed =
    * %3<2) — the exact claim incremental maintenance must prove. */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nw = docs.where(col("doc_id") % 3 === 2)
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      val shIdx = DataOps.shingleHashes(spark,
        docs.where(col("doc_id") % 3 < 2))
      return probe(spark, DataOps.shingleHashes(spark, nw),
        DataOps.minhashBandsOf(shIdx), shIdx)
    }
    val dir = StoreDirs.tmpStoreDir("graft-mh-incr", sfDir)
    if (built.add(dir)) {
      build(spark, docs.where(col("doc_id") % 3 === 0), dir)
      appendBatch(spark, docs.where(col("doc_id") % 3 === 1), dir)
    }
    dedupAgainst(spark, nw, dir)
  }

  /** DELETION — physically forget a doc_id set from the index (the K9
    * [[PostingsIndex.removeBatch]] discipline applied to the dedup
    * store): both relations rewrite WITHOUT the victims via anti-join —
    * a signature depends only on its own document, so removal is exact
    * and local (no other doc's bands/shingles change). Pinned in
    * MinhashIndexSpec (remove(build(all), odds) ≡ build(evens)
    * bit-for-bit) and hash-audited by the `dedupRemoved` registry entry
    * — which, after forgetting the odd half, probes it as a fresh
    * snapshot and must reproduce [[dedupIndexed]]'s own oracle exactly
    * (a single surviving victim band would self-match at Jaccard 1). */
  def removeBatch(spark: SparkSession, docIds: DataFrame,
      indexDir: String): Unit = {
    val ids = docIds.select(col("doc_id"))
    val sh = spark.read.parquet(s"$indexDir/shingles")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val bands = spark.read.parquet(s"$indexDir/bands")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    StoreDirs.replaceParquet(sh, s"$indexDir/shingles")
    StoreDirs.replaceParquet(bands, s"$indexDir/bands")
    ()
  }

  /** Registry form of the DELETION path: index the FULL corpus, forget
    * the odd half, then dedup that half against the shrunken store —
    * result ≡ [[dedupIndexed]] (same oracle): deletion left exactly the
    * even-half index and no victim can match itself. */
  def dedupRemoved(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nw = docs.where(col("doc_id") % 2 === 1)
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      val shIdx = DataOps.shingleHashes(spark,
        docs.where(col("doc_id") % 2 === 0))
      return probe(spark, DataOps.shingleHashes(spark, nw),
        DataOps.minhashBandsOf(shIdx), shIdx)
    }
    val dir = StoreDirs.tmpStoreDir("graft-mh-del", sfDir)
    if (built.add(dir)) {
      build(spark, docs, dir)
      removeBatch(spark, nw.select(col("doc_id")), dir)
    }
    dedupAgainst(spark, nw, dir)
  }

  /** Near-duplicates of `newDocs` AGAINST the stored corpus: banded
    * candidates (new bands ⋈ stored bands), exact-Jaccard verify ≥ 0.5
    * over shingle hashes. Output (doc_id, dup_of, jac_micro) — doc_id
    * from the snapshot, dup_of from the index. The snapshot side is
    * computed fresh (it is the small side); the corpus side is READ,
    * never recomputed. */
  def dedupAgainst(spark: SparkSession, newDocs: DataFrame,
      indexDir: String): DataFrame = {
    // Persisted: the snapshot shingle relation feeds its bands, the
    // verify join and its size aggregate.
    val shNew = DataOps.shingleHashes(spark, newDocs).persist()
    probe(spark, shNew,
      spark.read.parquet(s"$indexDir/bands"),
      spark.read.parquet(s"$indexDir/shingles"))
  }

  /** The probe plan proper — snapshot shingles vs an indexed corpus's
    * band/shingle relations (read from the store by [[dedupAgainst]],
    * built in-plan by [[dedupIndexed]]'s Explain path). */
  private def probe(spark: SparkSession, shNew: DataFrame,
      bandsIdx: DataFrame, shIdx: DataFrame): DataFrame = {
    val bandsNew = DataOps.minhashBandsOf(shNew)
    val cand = bandsNew.as("n").join(bandsIdx.as("o"),
        col("n.bh") === col("o.bh") &&
          col("n.doc_id") =!= col("o.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
    val nshNew = shNew.groupBy(col("doc_id").as("new_id"))
      .agg(count(lit(1)).as("n_new"))
    val nshIdx = shIdx.groupBy(col("doc_id").as("old_id"))
      .agg(count(lit(1)).as("n_old"))
    val inter = cand
      .join(shNew.as("a"), col("new_id") === col("a.doc_id"))
      .join(shIdx.as("b"),
        col("old_id") === col("b.doc_id") && col("a.h") === col("b.h"))
      .groupBy(col("new_id"), col("old_id"))
      .agg(count(lit(1)).as("inter"))
    DataOps.finish(inter
      .join(nshNew, Seq("new_id"))
      .join(nshIdx, Seq("old_id"))
      .select(col("new_id").as("doc_id"), col("old_id").as("dup_of"),
        round(col("inter").cast("double") /
          (col("n_new") + col("n_old") - col("inter")).cast("double") *
          lit(MICRO)).cast("long").as("jac_micro"))
      .where(col("jac_micro") >= 500000L),
      shNew)
  }

  /** Registry form of the store — the K4 analog of
    * [[PqIndex.annPqIndexed]], giving the incremental-dedup path an
    * oracle-checked entry: the even-doc_id half of the corpus plays
    * "the indexed crawl" (built once into a tmp store), the odd half
    * "the arriving snapshot" deduped against it via [[dedupAgainst]].
    * Output (doc_id = snapshot doc, dup_of = indexed doc, jac_micro).
    * The oracle replays the same split definitionally (string band
    * keys vs the store's 64-bit band hash — identical pair sets except
    * under a ~2^-64 collision, the documented whp contract; the verify
    * compares 60-bit shingle hashes exactly as the store does). */
  def dedupIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val old = docs.where(col("doc_id") % 2 === 0)
    val nw = docs.where(col("doc_id") % 2 === 1)
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: probe plan over fresh index
      // relations (plan-identical to the store read by design).
      val shIdx = DataOps.shingleHashes(spark, old)
      return probe(spark, DataOps.shingleHashes(spark, nw),
        DataOps.minhashBandsOf(shIdx), shIdx)
    }
    val dir = StoreDirs.tmpStoreDir("graft-mh-index", sfDir)
    if (built.add(dir)) build(spark, old, dir)
    dedupAgainst(spark, nw, dir)
  }

  /** CLUSTER LAYOUT — `bands/` persisted as a bucketed-by-`bh`,
    * per-bucket-sorted table ([[graft.ops.ScaleOps.writeBucketed]] —
    * the exact knob this store's own scaladoc names, the K9/K10
    * treatment at the dedup tier). Band hashes are DATA-dependent (a
    * snapshot's buckets aren't literals), so the win here is
    * CO-LOCATION rather than pruning: the candidate join's corpus side
    * arrives hash-partitioned on `bh` straight off the bucket scan —
    * no corpus-side Exchange, only the (small) snapshot side shuffles.
    * At 100 TB that is the difference between re-shuffling the
    * corpus's band relation per landed crawl snapshot and shuffling
    * only the snapshot. MinhashIndexSpec pins probe-result equality
    * and the single-Exchange plan. */
  def writeBucketedBands(spark: SparkSession, indexDir: String,
      table: String, buckets: Int = 32,
      path: Option[String] = None): Unit =
    graft.ops.ScaleOps.writeBucketed(
      spark.read.parquet(s"$indexDir/bands"), table, buckets,
      "bh", path)

  /** [[dedupAgainst]] with the band side read from the BUCKETED table
    * — the probe stage ([[probe]]) verbatim, layout-only change. */
  def dedupAgainstBucketed(spark: SparkSession, newDocs: DataFrame,
      table: String, indexDir: String): DataFrame = {
    val shNew = DataOps.shingleHashes(spark, newDocs).persist()
    probe(spark, shNew, spark.table(table),
      spark.read.parquet(s"$indexDir/shingles"))
  }

  /** One bucketed-table write per (JVM, sf directory). */
  private val bucketedBuilt =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Registry form of the BUCKETED layout — [[dedupIndexed]]'s
    * buildOnce store with its band relation re-laid out bucketed once,
    * probed by the same odd-half snapshot. Result ≡ [[dedupIndexed]]
    * (same oracle) — the K4 cluster-layout claim hash-audited
    * end-to-end, beside K9's `bm25Bucketed` and K10's
    * `phraseBucketed`. */
  def dedupBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val old = docs.where(col("doc_id") % 2 === 0)
    val nw = docs.where(col("doc_id") % 2 === 1)
    if (java.lang.Boolean.getBoolean("graft.lazyPlans")) {
      // Explain mode must run no job: the directory probe's plan is
      // the candidate/verify shape; the bucketed scan differs only in
      // layout.
      val shIdx = DataOps.shingleHashes(spark, old)
      return probe(spark, DataOps.shingleHashes(spark, nw),
        DataOps.minhashBandsOf(shIdx), shIdx)
    }
    val dir = StoreDirs.tmpStoreDir("graft-mh-index", sfDir)
    if (built.add(dir)) build(spark, old, dir)
    val table = "graft_bands_bkt_" +
      java.lang.Integer.toHexString(dir.hashCode).takeRight(8)
    if (bucketedBuilt.add(table)) {
      writeBucketedBands(spark, dir, table,
        path = Some(StoreDirs.tmpStoreDir("graft-bands-bktdata", sfDir)))
    }
    dedupAgainstBucketed(spark, nw, table, dir)
  }
}
