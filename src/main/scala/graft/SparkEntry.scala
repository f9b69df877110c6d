package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{OracleSql, OracleSqlData, OracleSqlRel}
import graft.pipeline.{DataOps, EventOps, RelOps, ParityQueries => PQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (the reference parity
  * surface, [[graft.pipeline.ParityQueries]]) and the LLM-data-pipeline
  * surface ([[graft.pipeline.DataOps]]) is registered here under a stable
  * name, paired with its DuckDB oracle SQL ([[graft.oracle.OracleSql]]).
  * Output column names match between the Spark plan and the SQL — the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's active DAG E1 (socket → parse → 1 s keyed
    * window concat → sentiment → sink, SentimentAnalysis.scala:41-59,216)
    * in its deterministic batch-twin form. */
  def entry(spark: SparkSession): DataFrame =
    PQ.x1Sentiment(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity surface (SURVEY.md §2.3-2.5) ---
    "r1Parse"             -> (PQ.r1Parse _),
    "w1Concat"            -> (PQ.w1Concat _),
    "w2Concat"            -> (PQ.w2Concat _),
    "x1Sentiment"         -> (PQ.x1Sentiment _),
    "x2Entities"          -> (PQ.x2Entities _),
    "w3EntityCount"       -> (PQ.w3EntityCount _),
    "trending"            -> (PQ.trending _),
    "x3Categories"        -> (PQ.x3Categories _),
    "r6CategorySentiment" -> (PQ.r6CategorySentiment _),
    "r7MoodUser"          -> (PQ.r7MoodUser _),
    "w4UserMoodRunning"   -> (PQ.w4UserMoodRunning _),
    "w5ChannelMoodSliding" -> (PQ.w5ChannelMoodSliding _),
    "w6CategoryOpinion"   -> (PQ.w6CategoryOpinion _),
    "w7EntityOpinion"     -> (PQ.w7EntityOpinion _),
    "w8ToxicUser"         -> (PQ.w8ToxicUser _),
    "w8ToxicTopic"        -> (PQ.w8ToxicTopic _),
    "w8ToxicChannel"      -> (PQ.w8ToxicChannel _),
    // --- LLM-data-pipeline surface (SURVEY.md §2.7) ---
    "dedupExact"          -> (DataOps.dedupExact _),
    "dedupMinhash"        -> (DataOps.dedupMinhash _),
    "minhashRecallEval"   -> (DataOps.minhashRecallEval _),
    "dedupRecallEval"     -> (DataOps.dedupRecallEval _),
    "dedupIndexed"        -> (graft.sources.MinhashIndex.dedupIndexed _),
    "dedupBucketed"       -> (graft.sources.MinhashIndex.dedupBucketed _),
    "dedupIncremental"    -> (graft.sources.MinhashIndex.dedupIncremental _),
    "dedupRemoved"        -> (graft.sources.MinhashIndex.dedupRemoved _),
    "minhashStats"        -> (graft.sources.MinhashIndex.minhashStats _),
    "corpusForget"        -> (graft.sources.Forget.corpusForget _),
    "forgetSearch"        -> (graft.sources.Forget.forgetSearch _),
    "forgetDedup"         -> (graft.sources.Forget.forgetDedup _),
    "forgetPhrase"        -> (graft.sources.Forget.forgetPhrase _),
    "forgetVectors"       -> (graft.sources.Forget.forgetVectors _),
    "forgetSq"            -> (graft.sources.Forget.forgetSq _),
    "forgetClassifier"    -> (graft.sources.Forget.forgetClassifier _),
    "forgetImportance"    -> (graft.sources.Forget.forgetImportance _),
    "dedupClusters"       -> (DataOps.dedupClusters _),
    "dupTriangles"        -> (DataOps.dupTriangles _),
    "dupCommunities"      -> (DataOps.dupCommunities _),
    "dedupSimhash"        -> (DataOps.dedupSimhash _),
    "dedupNgramSource"    -> (DataOps.dedupNgramSource _),
    // fixture-proportionate run length; production default is 50
    "dedupSubstring"      -> ((s: SparkSession, dir: String) =>
      DataOps.dedupSubstring(s, dir, DataOps.SubstringRunFixture)),
    "trimSubstringDups"   -> ((s: SparkSession, dir: String) =>
      DataOps.trimSubstringDups(s, dir, DataOps.SubstringRunFixture)),
    "dedupEmbed"          -> (DataOps.dedupEmbed _),
    "dedupEmbedScaled"    -> (DataOps.dedupEmbedScaled _),
    "semdedup"            -> (DataOps.semdedup _),
    "semdedupScaled"      -> (DataOps.semdedupScaled _),
    "annIvfScaled"        -> (DataOps.annIvfScaled _),
    "annPqScaled"         -> (DataOps.annPqScaled _),
    "annBrute"            -> (DataOps.annBrute _),
    "rangeSearch"         -> (DataOps.rangeSearch _),
    "knnClassify"         -> (DataOps.knnClassify _),
    "hardNegatives"       -> (DataOps.hardNegatives _),
    "centroidDrift"       -> (DataOps.centroidDrift _),
    "mmrDiversify"        -> (DataOps.mmrDiversify _),
    "annIvf"              -> (DataOps.annIvf _),
    "annLsh"              -> (DataOps.annLsh _),
    "annPq"               -> (DataOps.annPq _),
    "annPqIndexed"        -> (graft.sources.PqIndex.annPqIndexed _),
    "annPqIncremental"    -> (graft.sources.PqIndex.annPqIncremental _),
    "annPqRemoved"        -> (graft.sources.PqIndex.annPqRemoved _),
    "annIvfPq"            -> (DataOps.annIvfPq _),
    "annIvfPqIndexed"     -> (graft.sources.PqIndex.annIvfPqIndexed _),
    "annServeBucketed"    -> (graft.sources.PqIndex.annServeBucketed _),
    "annSq"               -> (DataOps.annSq _),
    "annRecallEval"       -> (DataOps.annRecallEval _),
    "annScaledRecall"     -> (DataOps.annScaledRecall _),
    "embedDedupRecall"    -> (DataOps.embedDedupRecall _),
    "annStoreRecall"      -> (DataOps.annStoreRecall _),
    "annSqIndexed"        -> (graft.sources.SqIndex.annSqIndexed _),
    "annSqIncremental"    -> (graft.sources.SqIndex.annSqIncremental _),
    "annSqRemoved"        -> (graft.sources.SqIndex.annSqRemoved _),
    "pqStats"             -> (graft.sources.PqIndex.pqStats _),
    "sqStats"             -> (graft.sources.SqIndex.sqStats _),
    "embedOutliers"       -> (DataOps.embedOutliers _),
    "labelBalance"        -> (DataOps.labelBalance _),
    "embedQuantize"       -> (DataOps.embedQuantize _),
    "embedPq"             -> (DataOps.embedPq _),
    "embedKmeans"         -> (DataOps.embedKmeans _),
    "langId"              -> (DataOps.langId _),
    "langConfusion"       -> (DataOps.langConfusion _),
    "langIdNgram"         -> (DataOps.langIdNgram _),
    "langIdStored"        -> (graft.sources.LangProfileStore.langIdStored _),
    "langIdIncremental"   -> (graft.sources.LangProfileStore.langIdIncremental _),
    "langIdRemoved"       -> (graft.sources.LangProfileStore.langIdRemoved _),
    "langStats"           -> (graft.sources.LangProfileStore.langStats _),
    "textQuality"         -> (DataOps.textQuality _),
    "qualityTrend"        -> (DataOps.qualityTrend _),
    "tokenCount"          -> (DataOps.tokenCount _),
    "tokenFertility"      -> (DataOps.tokenFertility _),
    "fingerprint"         -> (DataOps.fingerprint _),
    "winnowing"           -> (DataOps.winnowing _),
    "winnowOverlap"       -> (DataOps.winnowOverlap _),
    "invertedIndex"       -> (DataOps.invertedIndex _),
    "phraseSearch"        -> (DataOps.phraseSearch _),
    "phraseIndexed"       -> (graft.sources.PositionsIndex.phraseIndexed _),
    "proximitySearch"     -> (DataOps.proximitySearch _),
    "proximityIndexed"    -> (graft.sources.PositionsIndex.proximityIndexed _),
    "proximityServe"      -> (DataOps.proximityServe _),
    "phraseIncremental"   -> (graft.sources.PositionsIndex.phraseIncremental _),
    "phraseBucketed"      -> (graft.sources.PositionsIndex.phraseBucketed _),
    "phraseRemoved"       -> (graft.sources.PositionsIndex.phraseRemoved _),
    "positionsStats"      -> (graft.sources.PositionsIndex.positionsStats _),
    "tfidfSearch"         -> (DataOps.tfidfSearch _),
    "bm25Search"          -> (DataOps.bm25Search _),
    "bm25Serve"           -> (DataOps.bm25Serve _),
    "tfidfIndexed"        -> (graft.sources.PostingsIndex.tfidfIndexed _),
    "bm25Indexed"         -> (graft.sources.PostingsIndex.bm25Indexed _),
    "bm25Incremental"     -> (graft.sources.PostingsIndex.bm25Incremental _),
    "bm25Removed"         -> (graft.sources.PostingsIndex.bm25Removed _),
    "bm25Bucketed"        -> (graft.sources.PostingsIndex.bm25Bucketed _),
    "postingsStats"       -> (graft.sources.PostingsIndex.postingsStats _),
    "rrfFusion"           -> (DataOps.rrfFusion _),
    "rrfIndexed"          -> (graft.sources.PostingsIndex.rrfIndexed _),
    "cdcChunks"           -> (DataOps.cdcChunks _),
    "decontaminate"       -> (DataOps.decontaminate _),
    "docNovelty"          -> (DataOps.docNovelty _),
    "bloomDecontaminate"  -> (DataOps.bloomDecontaminate _),
    "stratifiedSample"    -> (DataOps.stratifiedSample _),
    "sampleByHash"        -> (DataOps.sampleByHash _),
    "snapshotDiff"        -> (DataOps.snapshotDiff _),
    "commonVocab"         -> (DataOps.commonVocab _),
    "typoPairs"           -> (DataOps.typoPairs _),
    "kmvQuantiles"        -> (DataOps.kmvQuantiles _),
    "keepBestPerSource"   -> (DataOps.keepBestPerSource _),
    "sourceCap"           -> (DataOps.sourceCap _),
    "lengthQuantiles"     -> (DataOps.lengthQuantiles _),
    "multimodal"          -> (DataOps.multimodal _),
    "mediaResize"         -> (DataOps.mediaResize _),
    "frameSample"         -> (DataOps.frameSample _),
    "packSequences"       -> (DataOps.packSequences _),
    "shardPlan"           -> (DataOps.shardPlan _),
    "packingEfficiency"   -> (DataOps.packingEfficiency _),
    "foldLeakage"         -> (DataOps.foldLeakage _),
    "gopherFilter"        -> (DataOps.gopherFilter _),
    "piiScan"             -> (DataOps.piiScan _),
    "kAnonymity"          -> (DataOps.kAnonymity _),
    "sourceJaccard"       -> (DataOps.sourceJaccard _),
    "piiRedact"           -> (DataOps.piiRedact _),
    "mixQuotas"           -> (DataOps.mixQuotas _),
    "quotaSample"         -> (DataOps.quotaSample _),
    "topBigrams"          -> (DataOps.topBigrams _),
    "heavyHitters"        -> (DataOps.heavyHitters _),
    "cmsFrequency"        -> (DataOps.cmsFrequency _),
    "amsF2Skew"           -> (DataOps.amsF2Skew _),
    "repetitionSignals"   -> (DataOps.repetitionSignals _),
    "retentionDecision"   -> (DataOps.retentionDecision _),
    "curationFunnel"      -> (DataOps.curationFunnel _),
    "dupSourceMatrix"     -> (DataOps.dupSourceMatrix _),
    "chunkDocuments"      -> (DataOps.chunkDocuments _),
    "docEmbedStats"       -> (DataOps.docEmbedStats _),
    "vocabCoverage"       -> (DataOps.vocabCoverage _),
    "zipfFit"             -> (DataOps.zipfFit _),
    "bpeMerges"           -> (DataOps.bpeMerges _),
    "bpeSegment"          -> (DataOps.bpeSegment _),
    "unigramSurprisal"    -> (DataOps.unigramSurprisal _),
    "qualityBuckets"      -> (DataOps.qualityBuckets _),
    "bigramSurprisal"     -> (DataOps.bigramSurprisal _),
    "dsirWeights"         -> (DataOps.dsirWeights _),
    "dsirStored"          -> (graft.sources.DsirStore.dsirStored _),
    "dsirIncremental"     -> (graft.sources.DsirStore.dsirIncremental _),
    "dsirRemoved"         -> (graft.sources.DsirStore.dsirRemoved _),
    "dsirStats"           -> (graft.sources.DsirStore.dsirStats _),
    "keywordsTfidf"       -> (DataOps.keywordsTfidf _),
    "sourceKeywords"      -> (DataOps.sourceKeywords _),
    "textrankKeywords"    -> (DataOps.textrankKeywords _),
    "pmiBigrams"          -> (DataOps.pmiBigrams _),
    // --- general relational surface (SURVEY.md §2.6) ---
    "eventsHourly"        -> (RelOps.eventsHourly _),
    "q1Pricing"           -> (RelOps.q1Pricing _),
    "q3Revenue"           -> (RelOps.q3Revenue _),
    "q5LocalRevenue"      -> (RelOps.q5LocalRevenue _),
    "topkOrders"          -> (RelOps.topkOrders _),
    "rollupRevenue"       -> (RelOps.rollupRevenue _),
    "cubeRevenue"         -> (RelOps.cubeRevenue _),
    "pivotDailyValues"    -> (RelOps.pivotDailyValues _),
    "distinctUsers"       -> (RelOps.distinctUsers _),
    "hllDistinctUsers"    -> (RelOps.hllDistinctUsers _),
    "hllRollingUsers"     -> (RelOps.hllRollingUsers _),
    "thetaOverlapUsers"   -> (RelOps.thetaOverlapUsers _),
    "q14PromoShare"       -> (RelOps.q14PromoShare _),
    "q7VolumeShipping"    -> (RelOps.q7VolumeShipping _),
    "q10Returns"          -> (RelOps.q10Returns _),
    "q18LargeOrders"      -> (RelOps.q18LargeOrders _),
    "q6Forecast"          -> (RelOps.q6Forecast _),
    "q13OrderDist"        -> (RelOps.q13OrderDist _),
    "q15TopSupplier"      -> (RelOps.q15TopSupplier _),
    "q4LateOrders"        -> (RelOps.q4LateOrders _),
    "q12PriorityClass"    -> (RelOps.q12PriorityClass _),
    "q17SmallQtyRevenue"  -> (RelOps.q17SmallQtyRevenue _),
    "q19BrandRevenue"     -> (RelOps.q19BrandRevenue _),
    "q2MinCostSupp"       -> (RelOps.q2MinCostSupp _),
    "q8MarketShare"       -> (RelOps.q8MarketShare _),
    "q9ProfitByNation"    -> (RelOps.q9ProfitByNation _),
    "q11ImportantParts"   -> (RelOps.q11ImportantParts _),
    "q16SupplierCnt"      -> (RelOps.q16SupplierCnt _),
    "q20ExcessShippers"   -> (RelOps.q20ExcessShippers _),
    "q21WaitingSupp"      -> (RelOps.q21WaitingSupp _),
    "q22GlobalSales"      -> (RelOps.q22GlobalSales _),
    "sqlSourceStats"      -> (RelOps.sqlSourceStats _),
    "basketPairs"         -> (RelOps.basketPairs _),
    // --- event-stream analytics (as-of join / sessions / JSON path) ---
    "asofAttribution"     -> (EventOps.asofAttribution _),
    "sessionize"          -> (EventOps.sessionize _),
    "rangeJoinRecentErrors" -> (EventOps.rangeJoinRecentErrors _),
    "jsonPropsStats"      -> (EventOps.jsonPropsStats _),
    "latestEventState"    -> (EventOps.latestEventState _),
    "funnelSteps"         -> (EventOps.funnelSteps _),
    "retentionCohorts"    -> (EventOps.retentionCohorts _),
    "activityGapfill"     -> (EventOps.activityGapfill _),
    "anomalousHours"      -> (EventOps.anomalousHours _),
    "eventHistoryScd2"    -> (EventOps.eventHistoryScd2 _),
    "stateAsOfMidmonth"   -> (EventOps.stateAsOfMidmonth _),
    "conversionLatency"   -> (EventOps.conversionLatency _),
    "userCadence"         -> (EventOps.userCadence _),
    "eventTransitions"    -> (EventOps.eventTransitions _),
    "eventPagerank"       -> (EventOps.eventPagerank _),
    "topPaths"            -> (EventOps.topPaths _),
    "columnProfile"       -> (EventOps.columnProfile _),
    "seasonalProfile"     -> (EventOps.seasonalProfile _),
    "rfmScores"           -> (EventOps.rfmScores _),
    "sessionSummary"      -> (EventOps.sessionSummary _),
    "userLtv"             -> (EventOps.userLtv _),
    "eventSkewProfile"    -> (EventOps.eventSkewProfile _),
    "valueOutliers"       -> (EventOps.valueOutliers _),
    "winsorize"           -> (EventOps.winsorize _),
    "madOutliers"         -> (EventOps.madOutliers _),
    "valueDrift"          -> (EventOps.valueDrift _),
    "cusumDrift"          -> (EventOps.cusumDrift _),
    "ewmaSmooth"          -> (EventOps.ewmaSmooth _),
    "eventAutocorr"       -> (EventOps.eventAutocorr _),
    "concurrentSessions"  -> (EventOps.concurrentSessions _),
    "burstiness"          -> (EventOps.burstiness _),
    "dauStickiness"       -> (EventOps.dauStickiness _),
    "abTestMetrics"       -> (EventOps.abTestMetrics _),
    // --- trained-model scorer (SURVEY.md §2.5 X1 model tier) ---
    // Closed-form deterministic trainer — oracle-checked like every
    // other entry (the MLlib LBFGS tier stays as a spec-tested library
    // API; its float combine order is not replayable).
    "x1SentimentMl"       -> (graft.nlp.MlSentiment.x1SentimentMl _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "r1Parse"             -> OracleSql.r1Parse,
    "w1Concat"            -> OracleSql.w1Concat,
    "w2Concat"            -> OracleSql.w2Concat,
    "x1Sentiment"         -> OracleSql.x1Sentiment,
    "x2Entities"          -> OracleSql.x2Entities,
    "w3EntityCount"       -> OracleSql.w3EntityCount,
    "trending"            -> OracleSql.trending,
    "x3Categories"        -> OracleSql.x3Categories,
    "r6CategorySentiment" -> OracleSql.r6CategorySentiment,
    "r7MoodUser"          -> OracleSql.r7MoodUser,
    "w4UserMoodRunning"   -> OracleSql.w4UserMoodRunning,
    "w5ChannelMoodSliding" -> OracleSql.w5ChannelMoodSliding,
    "w6CategoryOpinion"   -> OracleSql.w6CategoryOpinion,
    "w7EntityOpinion"     -> OracleSql.w7EntityOpinion,
    "w8ToxicUser"         -> OracleSql.w8ToxicUser,
    "w8ToxicTopic"        -> OracleSql.w8ToxicTopic,
    "w8ToxicChannel"      -> OracleSql.w8ToxicChannel,
    // --- LLM-data-pipeline surface (SURVEY.md §2.7) ---
    "dedupExact"          -> OracleSqlData.dedupExact,
    "dedupMinhash"        -> OracleSqlData.dedupMinhash,
    "minhashRecallEval"   -> OracleSqlData.minhashRecallEval,
    // tier-comparable dedup audit: every shipped pair relation scored
    // against the one shingle-Jaccard-0.5 truth on the same sample
    "dedupRecallEval"     -> OracleSqlData.dedupRecallEval,
    "dedupIndexed"        -> OracleSqlData.dedupIndexed,
    // the bucketed-by-bh K4 band layout serves the same snapshot probe
    // byte-identically — dedupIndexed's oracle verbatim
    "dedupBucketed"       -> OracleSqlData.dedupIndexed,
    // two-step store (build a third, append a third) must answer the
    // last third's probe exactly like a one-shot build over both
    "dedupIncremental"    -> OracleSqlData.dedupIncremental,
    // deletion path shares the split oracle: after forgetting the odd
    // half, the index IS the even half (the bm25Removed discipline)
    "dedupRemoved"        -> OracleSqlData.dedupIndexed,
    // K4 telemetry: store health numbers recomputed from corpus truth
    "minhashStats"        -> OracleSqlData.minhashStats,
    // ONE composed forget call, seven audited surfaces: the rewritten
    // corpus rollup, the maintained postings/dedup/positions stores,
    // the PQ/SQ vector stores (annPq/annSqRemoved's survivors-only
    // code mirrors) and the subtracted language/importance models
    // (the evens-trained langIdStored/dsirRemoved mirrors)
    "corpusForget"        -> OracleSqlData.corpusForget,
    "forgetSearch"        -> OracleSqlData.bm25Removed,
    "forgetDedup"         -> OracleSqlData.dedupIndexed,
    "forgetVectors"       -> OracleSqlData.annPqRemoved,
    "forgetSq"            -> OracleSqlData.annSqRemoved,
    "forgetClassifier"    -> OracleSqlData.langIdStored,
    "forgetImportance"    -> OracleSqlData.dsirRemoved,
    "forgetPhrase"        -> OracleSqlData.phraseRemoved,
    "dedupClusters"       -> OracleSqlData.dedupClusters,
    "dupTriangles"        -> OracleSqlData.dupTriangles,
    "dupCommunities"      -> OracleSqlData.dupCommunities,
    "dedupSimhash"        -> OracleSqlData.dedupSimhash,
    "dedupNgramSource"    -> OracleSqlData.dedupNgramSource,
    "dedupSubstring"      -> OracleSqlData.dedupSubstring,
    "trimSubstringDups"   -> OracleSqlData.trimSubstringDups,
    "dedupEmbed"          -> OracleSqlData.dedupEmbed,
    // the scaled-C pair report: C and the sample modulus derive from
    // count(*) in the shared scalar `prm` CTE
    "dedupEmbedScaled"    -> OracleSqlData.dedupEmbedScaled,
    "semdedup"            -> OracleSqlData.semdedup,
    // the production C ∝ N tier, replayed definitionally: C and the
    // sample modulus derive from count(*) in a scalar CTE
    "semdedupScaled"      -> OracleSqlData.semdedupScaled,
    // the capacity-scaled ANN tiers, same discipline: C/K/probe-width/
    // shortlist all derive from count(*) in scalar CTEs
    "annIvfScaled"        -> OracleSqlData.annIvfScaled,
    "annPqScaled"         -> OracleSqlData.annPqScaled,
    "annBrute"            -> OracleSqlData.annBrute,
    "rangeSearch"         -> OracleSqlData.rangeSearch,
    "knnClassify"         -> OracleSqlData.knnClassify,
    "hardNegatives"       -> OracleSqlData.hardNegatives,
    "centroidDrift"       -> OracleSqlData.centroidDrift,
    "mmrDiversify"        -> OracleSqlData.mmrDiversify,
    "annIvf"              -> OracleSqlData.annIvf,
    "annLsh"              -> OracleSqlData.annLsh,
    "annPq"               -> OracleSqlData.annPq,
    // the persistent-store round-trip must reproduce annPq exactly,
    // so it shares its oracle verbatim
    "annPqIndexed"        -> OracleSqlData.annPq,
    // lifecycle mirrors: frozen-codebook append (train CTEs filter to
    // the build half), survivors-only codes after remove_ids
    "annPqIncremental"    -> OracleSqlData.annPqIncremental,
    "annPqRemoved"        -> OracleSqlData.annPqRemoved,
    "annIvfPq"            -> OracleSqlData.annIvfPq,
    // composed probe served from the SAME store as annPqIndexed (one
    // build, both ANN paths) — round-trip lossless, oracle verbatim
    "annIvfPqIndexed"     -> OracleSqlData.annIvfPq,
    // the FAISS inverted-list layout: codes bucketed by coarse cell,
    // one serving query answered from the pruned buckets — the
    // annIvfPq mirror restricted to the minimum standard q_id
    "annServeBucketed"    -> OracleSqlData.annServeBucketed,
    "annSq"               -> OracleSqlData.annSq,
    "annRecallEval"       -> OracleSqlData.annRecallEval,
    // composes the scaled tiers' own mirrors with the brute truth;
    // the 10x replay exceeds the DuckDB spill budget (documented in
    // the operator scaladoc) — the driver gates replay fine
    "annScaledRecall"     -> OracleSqlData.annScaledRecall,
    // both blocked embed-dedup tiers vs the exact all-pairs truth on
    // one guarded sample — the scanned-fraction price as a hashed
    // relation
    "embedDedupRecall"    -> OracleSqlData.embedDedupRecall,
    "annStoreRecall"      -> OracleSqlData.annStoreRecall,
    // store round-trip is lossless (exact-integer reconstruction
    // relation), so it shares annSq's oracle verbatim
    "annSqIndexed"        -> OracleSqlData.annSq,
    // SQ8 codes are per-vector, so the two-step store IS the one-shot
    // build — annSq's oracle verbatim; deletion filters to survivors
    "annSqIncremental"    -> OracleSqlData.annSq,
    "annSqRemoved"        -> OracleSqlData.annSqRemoved,
    // K5/K7 telemetry: store health numbers (with value checksums)
    // recomputed from corpus truth by re-training/re-quantizing
    "pqStats"             -> OracleSqlData.pqStats,
    "sqStats"             -> OracleSqlData.sqStats,
    "embedOutliers"       -> OracleSqlData.embedOutliers,
    "labelBalance"        -> OracleSqlData.labelBalance,
    "embedQuantize"       -> OracleSqlData.embedQuantize,
    "embedPq"             -> OracleSqlData.embedPq,
    "embedKmeans"         -> OracleSqlData.embedKmeans,
    "langId"              -> OracleSqlData.langId,
    "langConfusion"       -> OracleSqlData.langConfusion,
    "langIdNgram"         -> OracleSqlData.langIdNgram,
    "langIdStored"        -> OracleSqlData.langIdStored,
    // count sums make build(evens)+append(odds) == a one-shot
    // full-corpus train, so the incremental store shares langIdNgram's
    // oracle verbatim (the bm25Incremental discipline)
    "langIdIncremental"   -> OracleSqlData.langIdNgram,
    // count deletion leaves exactly the evens-trained model, so the
    // forgotten-half probe shares langIdStored's split oracle
    "langIdRemoved"       -> OracleSqlData.langIdStored,
    // K6 telemetry: the maintained count/profile relations audited
    // against a from-scratch full-corpus train
    "langStats"           -> OracleSqlData.langStats,
    "textQuality"         -> OracleSqlData.textQuality,
    "qualityTrend"        -> OracleSqlData.qualityTrend,
    "tokenCount"          -> OracleSqlData.tokenCount,
    "tokenFertility"      -> OracleSqlData.tokenFertility,
    "fingerprint"         -> OracleSqlData.fingerprint,
    "winnowing"           -> OracleSqlData.winnowing,
    "winnowOverlap"       -> OracleSqlData.winnowOverlap,
    "invertedIndex"       -> OracleSqlData.invertedIndex,
    "phraseSearch"        -> OracleSqlData.phraseSearch,
    // K10 positional store: round-trip and per-doc-additive append
    // share the batch operator's oracle verbatim; deletion filters the
    // positional side to the survivors
    "phraseIndexed"       -> OracleSqlData.phraseSearch,
    // one positional store, two query families: the proximity probe
    // shares the phrase store and its own definitional mirror
    "proximitySearch"     -> OracleSqlData.proximitySearch,
    "proximityIndexed"    -> OracleSqlData.proximitySearch,
    // multi-pair serving batch: two pairs, one pass, q_id-keyed
    "proximityServe"      -> OracleSqlData.proximityServe,
    "phraseIncremental"   -> OracleSqlData.phraseSearch,
    // the bucketed-by-token positional cluster layout serves the
    // standard phrase byte-identically — phraseSearch's oracle verbatim
    "phraseBucketed"      -> OracleSqlData.phraseSearch,
    "phraseRemoved"       -> OracleSqlData.phraseRemoved,
    // K10 telemetry: the maintained positional relation audited
    // against a from-scratch re-tokenize
    "positionsStats"      -> OracleSqlData.positionsStats,
    "tfidfSearch"         -> OracleSqlData.tfidfSearch,
    "bm25Search"          -> OracleSqlData.bm25Search,
    "bm25Serve"           -> OracleSqlData.bm25Serve,
    // store probes share the batch operators' oracles by design: the
    // parquet round-trip must be lossless (the annPqIndexed discipline)
    "tfidfIndexed"        -> OracleSqlData.tfidfSearch,
    "bm25Indexed"         -> OracleSqlData.bm25Search,
    "bm25Incremental"     -> OracleSqlData.bm25Search,
    "bm25Removed"         -> OracleSqlData.bm25Removed,
    // the bucketed-by-token cluster layout serves the standard query
    // byte-identically — bm25Search's oracle verbatim
    "bm25Bucketed"        -> OracleSqlData.bm25Search,
    "postingsStats"       -> OracleSqlData.postingsStats,
    "rrfFusion"           -> OracleSqlData.rrfFusion,
    // hybrid fusion served off ONE persistent index: both store
    // rankers are proven ≡ their batch twins, fusion stage shared
    // verbatim — rrfFusion's oracle applies unchanged
    "rrfIndexed"          -> OracleSqlData.rrfFusion,
    "cdcChunks"           -> OracleSqlData.cdcChunks,
    "decontaminate"       -> OracleSqlData.decontaminate,
    "docNovelty"          -> OracleSqlData.docNovelty,
    "bloomDecontaminate"  -> OracleSqlData.bloomDecontaminate,
    "stratifiedSample"    -> OracleSqlData.stratifiedSample,
    "sampleByHash"        -> OracleSqlData.sampleByHash,
    "snapshotDiff"        -> OracleSqlData.snapshotDiff,
    "commonVocab"         -> OracleSqlData.commonVocab,
    "typoPairs"           -> OracleSqlData.typoPairs,
    "kmvQuantiles"        -> OracleSqlData.kmvQuantiles,
    "keepBestPerSource"   -> OracleSqlData.keepBestPerSource,
    "sourceCap"           -> OracleSqlData.sourceCap,
    "lengthQuantiles"     -> OracleSqlData.lengthQuantiles,
    "multimodal"          -> OracleSqlData.multimodal,
    "mediaResize"         -> OracleSqlData.mediaResize,
    "frameSample"         -> OracleSqlData.frameSample,
    "packSequences"       -> OracleSqlData.packSequences,
    "shardPlan"           -> OracleSqlData.shardPlan,
    "packingEfficiency"   -> OracleSqlData.packingEfficiency,
    "foldLeakage"         -> OracleSqlData.foldLeakage,
    "gopherFilter"        -> OracleSqlData.gopherFilter,
    "piiScan"             -> OracleSqlData.piiScan,
    "kAnonymity"          -> OracleSqlData.kAnonymity,
    "sourceJaccard"       -> OracleSqlData.sourceJaccard,
    "piiRedact"           -> OracleSqlData.piiRedact,
    "mixQuotas"           -> OracleSqlData.mixQuotas,
    "quotaSample"         -> OracleSqlData.quotaSample,
    "topBigrams"          -> OracleSqlData.topBigrams,
    "heavyHitters"        -> OracleSqlData.heavyHitters,
    "cmsFrequency"        -> OracleSqlData.cmsFrequency,
    "amsF2Skew"           -> OracleSqlData.amsF2Skew,
    "repetitionSignals"   -> OracleSqlData.repetitionSignals,
    "retentionDecision"   -> OracleSqlData.retentionDecision,
    // the funnel nests the retentionDecision mirror verbatim
    "curationFunnel"      -> OracleSqlData.curationFunnel,
    "dupSourceMatrix"     -> OracleSqlData.dupSourceMatrix,
    "chunkDocuments"      -> OracleSqlData.chunkDocuments,
    "docEmbedStats"       -> OracleSqlData.docEmbedStats,
    "vocabCoverage"       -> OracleSqlData.vocabCoverage,
    "zipfFit"             -> OracleSqlData.zipfFit,
    "bpeMerges"           -> OracleSqlData.bpeMerges,
    "bpeSegment"          -> OracleSqlData.bpeSegment,
    "unigramSurprisal"    -> OracleSqlData.unigramSurprisal,
    "qualityBuckets"      -> OracleSqlData.qualityBuckets,
    "bigramSurprisal"     -> OracleSqlData.bigramSurprisal,
    "dsirWeights"         -> OracleSqlData.dsirWeights,
    // store round-trip must reproduce the self-trained scoring exactly,
    // so it shares dsirWeights' oracle verbatim
    "dsirStored"          -> OracleSqlData.dsirWeights,
    // bucket sums make the two-step store == the one-shot build
    "dsirIncremental"     -> OracleSqlData.dsirWeights,
    // bucket deletion leaves the evens-trained statistics; every doc
    // still scores (unseen buckets hit the smoothing floor)
    "dsirRemoved"         -> OracleSqlData.dsirRemoved,
    // K8 telemetry: the maintained bucket statistics audited against a
    // from-scratch full-corpus derivation
    "dsirStats"           -> OracleSqlData.dsirStats,
    "keywordsTfidf"       -> OracleSqlData.keywordsTfidf,
    "sourceKeywords"      -> OracleSqlData.sourceKeywords,
    "textrankKeywords"    -> OracleSqlData.textrankKeywords,
    "pmiBigrams"          -> OracleSqlData.pmiBigrams,
    // --- general relational surface (SURVEY.md §2.6) ---
    "eventsHourly"        -> OracleSqlRel.eventsHourly,
    "q1Pricing"           -> OracleSqlRel.q1Pricing,
    "q3Revenue"           -> OracleSqlRel.q3Revenue,
    "q5LocalRevenue"      -> OracleSqlRel.q5LocalRevenue,
    "topkOrders"          -> OracleSqlRel.topkOrders,
    "rollupRevenue"       -> OracleSqlRel.rollupRevenue,
    "cubeRevenue"         -> OracleSqlRel.cubeRevenue,
    "pivotDailyValues"    -> OracleSqlRel.pivotDailyValues,
    "distinctUsers"       -> OracleSqlRel.distinctUsers,
    "hllDistinctUsers"    -> OracleSqlRel.hllDistinctUsers,
    "hllRollingUsers"     -> OracleSqlRel.hllRollingUsers,
    "thetaOverlapUsers"   -> OracleSqlRel.thetaOverlapUsers,
    "q14PromoShare"       -> OracleSqlRel.q14PromoShare,
    "q7VolumeShipping"    -> OracleSqlRel.q7VolumeShipping,
    "q10Returns"          -> OracleSqlRel.q10Returns,
    "q18LargeOrders"      -> OracleSqlRel.q18LargeOrders,
    "q6Forecast"          -> OracleSqlRel.q6Forecast,
    "q13OrderDist"        -> OracleSqlRel.q13OrderDist,
    "q15TopSupplier"      -> OracleSqlRel.q15TopSupplier,
    "q4LateOrders"        -> OracleSqlRel.q4LateOrders,
    "q12PriorityClass"    -> OracleSqlRel.q12PriorityClass,
    "q17SmallQtyRevenue"  -> OracleSqlRel.q17SmallQtyRevenue,
    "q19BrandRevenue"     -> OracleSqlRel.q19BrandRevenue,
    "q2MinCostSupp"       -> OracleSqlRel.q2MinCostSupp,
    "q8MarketShare"       -> OracleSqlRel.q8MarketShare,
    "q9ProfitByNation"    -> OracleSqlRel.q9ProfitByNation,
    "q11ImportantParts"   -> OracleSqlRel.q11ImportantParts,
    "q16SupplierCnt"      -> OracleSqlRel.q16SupplierCnt,
    "q20ExcessShippers"   -> OracleSqlRel.q20ExcessShippers,
    "q21WaitingSupp"      -> OracleSqlRel.q21WaitingSupp,
    "q22GlobalSales"      -> OracleSqlRel.q22GlobalSales,
    "sqlSourceStats"      -> OracleSqlRel.sqlSourceStats,
    "basketPairs"         -> OracleSqlRel.basketPairs,
    "asofAttribution"     -> OracleSqlRel.asofAttribution,
    "sessionize"          -> OracleSqlRel.sessionize,
    "rangeJoinRecentErrors" -> OracleSqlRel.rangeJoinRecentErrors,
    "jsonPropsStats"      -> OracleSqlRel.jsonPropsStats,
    "latestEventState"    -> OracleSqlRel.latestEventState,
    "funnelSteps"         -> OracleSqlRel.funnelSteps,
    "retentionCohorts"    -> OracleSqlRel.retentionCohorts,
    "activityGapfill"     -> OracleSqlRel.activityGapfill,
    "anomalousHours"      -> OracleSqlRel.anomalousHours,
    "eventHistoryScd2"    -> OracleSqlRel.eventHistoryScd2,
    "stateAsOfMidmonth"   -> OracleSqlRel.stateAsOfMidmonth,
    "conversionLatency"   -> OracleSqlRel.conversionLatency,
    "userCadence"         -> OracleSqlRel.userCadence,
    "eventTransitions"    -> OracleSqlRel.eventTransitions,
    "eventPagerank"       -> OracleSqlRel.eventPagerank,
    "topPaths"            -> OracleSqlRel.topPaths,
    "columnProfile"       -> OracleSqlRel.columnProfile,
    "seasonalProfile"     -> OracleSqlRel.seasonalProfile,
    "rfmScores"           -> OracleSqlRel.rfmScores,
    "sessionSummary"      -> OracleSqlRel.sessionSummary,
    "userLtv"             -> OracleSqlRel.userLtv,
    "eventSkewProfile"    -> OracleSqlRel.eventSkewProfile,
    "valueOutliers"       -> OracleSqlRel.valueOutliers,
    "winsorize"           -> OracleSqlRel.winsorize,
    "madOutliers"         -> OracleSqlRel.madOutliers,
    "valueDrift"          -> OracleSqlRel.valueDrift,
    "cusumDrift"          -> OracleSqlRel.cusumDrift,
    "ewmaSmooth"          -> OracleSqlRel.ewmaSmooth,
    "eventAutocorr"       -> OracleSqlRel.eventAutocorr,
    "concurrentSessions"  -> OracleSqlRel.concurrentSessions,
    "burstiness"          -> OracleSqlRel.burstiness,
    "dauStickiness"       -> OracleSqlRel.dauStickiness,
    "abTestMetrics"       -> OracleSqlRel.abTestMetrics,
    "x1SentimentMl"       -> OracleSql.x1SentimentMl,
  )
}
