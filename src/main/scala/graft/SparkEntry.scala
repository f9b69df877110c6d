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
    "dedupClusters"       -> (DataOps.dedupClusters _),
    "dedupSimhash"        -> (DataOps.dedupSimhash _),
    "dedupNgramSource"    -> (DataOps.dedupNgramSource _),
    // fixture-proportionate run length; production default is 50
    "dedupSubstring"      -> ((s: SparkSession, dir: String) =>
      DataOps.dedupSubstring(s, dir, DataOps.SubstringRunFixture)),
    "trimSubstringDups"   -> ((s: SparkSession, dir: String) =>
      DataOps.trimSubstringDups(s, dir, DataOps.SubstringRunFixture)),
    "dedupEmbed"          -> (DataOps.dedupEmbed _),
    "annBrute"            -> (DataOps.annBrute _),
    "annIvf"              -> (DataOps.annIvf _),
    "annLsh"              -> (DataOps.annLsh _),
    "annPq"               -> (DataOps.annPq _),
    "embedQuantize"       -> (DataOps.embedQuantize _),
    "embedPq"             -> (DataOps.embedPq _),
    "langId"              -> (DataOps.langId _),
    "langConfusion"       -> (DataOps.langConfusion _),
    "textQuality"         -> (DataOps.textQuality _),
    "tokenCount"          -> (DataOps.tokenCount _),
    "fingerprint"         -> (DataOps.fingerprint _),
    "decontaminate"       -> (DataOps.decontaminate _),
    "bloomDecontaminate"  -> (DataOps.bloomDecontaminate _),
    "stratifiedSample"    -> (DataOps.stratifiedSample _),
    "sampleByHash"        -> (DataOps.sampleByHash _),
    "snapshotDiff"        -> (DataOps.snapshotDiff _),
    "keepBestPerSource"   -> (DataOps.keepBestPerSource _),
    "sourceCap"           -> (DataOps.sourceCap _),
    "lengthQuantiles"     -> (DataOps.lengthQuantiles _),
    "multimodal"          -> (DataOps.multimodal _),
    "mediaResize"         -> (DataOps.mediaResize _),
    "frameSample"         -> (DataOps.frameSample _),
    "packSequences"       -> (DataOps.packSequences _),
    "topBigrams"          -> (DataOps.topBigrams _),
    "repetitionSignals"   -> (DataOps.repetitionSignals _),
    "retentionDecision"   -> (DataOps.retentionDecision _),
    "dupSourceMatrix"     -> (DataOps.dupSourceMatrix _),
    "chunkDocuments"      -> (DataOps.chunkDocuments _),
    "docEmbedStats"       -> (DataOps.docEmbedStats _),
    "vocabCoverage"       -> (DataOps.vocabCoverage _),
    "bpeMerges"           -> (DataOps.bpeMerges _),
    "unigramSurprisal"    -> (DataOps.unigramSurprisal _),
    "pmiBigrams"          -> (DataOps.pmiBigrams _),
    // --- general relational surface (SURVEY.md §2.6) ---
    "eventsHourly"        -> (RelOps.eventsHourly _),
    "q1Pricing"           -> (RelOps.q1Pricing _),
    "q3Revenue"           -> (RelOps.q3Revenue _),
    "q5LocalRevenue"      -> (RelOps.q5LocalRevenue _),
    "topkOrders"          -> (RelOps.topkOrders _),
    "rollupRevenue"       -> (RelOps.rollupRevenue _),
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
    "sqlSourceStats"      -> (RelOps.sqlSourceStats _),
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
    "dedupClusters"       -> OracleSqlData.dedupClusters,
    "dedupSimhash"        -> OracleSqlData.dedupSimhash,
    "dedupNgramSource"    -> OracleSqlData.dedupNgramSource,
    "dedupSubstring"      -> OracleSqlData.dedupSubstring,
    "trimSubstringDups"   -> OracleSqlData.trimSubstringDups,
    "dedupEmbed"          -> OracleSqlData.dedupEmbed,
    "annBrute"            -> OracleSqlData.annBrute,
    "annIvf"              -> OracleSqlData.annIvf,
    "annLsh"              -> OracleSqlData.annLsh,
    "annPq"               -> OracleSqlData.annPq,
    "embedQuantize"       -> OracleSqlData.embedQuantize,
    "embedPq"             -> OracleSqlData.embedPq,
    "langId"              -> OracleSqlData.langId,
    "langConfusion"       -> OracleSqlData.langConfusion,
    "textQuality"         -> OracleSqlData.textQuality,
    "tokenCount"          -> OracleSqlData.tokenCount,
    "fingerprint"         -> OracleSqlData.fingerprint,
    "decontaminate"       -> OracleSqlData.decontaminate,
    "bloomDecontaminate"  -> OracleSqlData.bloomDecontaminate,
    "stratifiedSample"    -> OracleSqlData.stratifiedSample,
    "sampleByHash"        -> OracleSqlData.sampleByHash,
    "snapshotDiff"        -> OracleSqlData.snapshotDiff,
    "keepBestPerSource"   -> OracleSqlData.keepBestPerSource,
    "sourceCap"           -> OracleSqlData.sourceCap,
    "lengthQuantiles"     -> OracleSqlData.lengthQuantiles,
    "multimodal"          -> OracleSqlData.multimodal,
    "mediaResize"         -> OracleSqlData.mediaResize,
    "frameSample"         -> OracleSqlData.frameSample,
    "packSequences"       -> OracleSqlData.packSequences,
    "topBigrams"          -> OracleSqlData.topBigrams,
    "repetitionSignals"   -> OracleSqlData.repetitionSignals,
    "retentionDecision"   -> OracleSqlData.retentionDecision,
    "dupSourceMatrix"     -> OracleSqlData.dupSourceMatrix,
    "chunkDocuments"      -> OracleSqlData.chunkDocuments,
    "docEmbedStats"       -> OracleSqlData.docEmbedStats,
    "vocabCoverage"       -> OracleSqlData.vocabCoverage,
    "bpeMerges"           -> OracleSqlData.bpeMerges,
    "unigramSurprisal"    -> OracleSqlData.unigramSurprisal,
    "pmiBigrams"          -> OracleSqlData.pmiBigrams,
    // --- general relational surface (SURVEY.md §2.6) ---
    "eventsHourly"        -> OracleSqlRel.eventsHourly,
    "q1Pricing"           -> OracleSqlRel.q1Pricing,
    "q3Revenue"           -> OracleSqlRel.q3Revenue,
    "q5LocalRevenue"      -> OracleSqlRel.q5LocalRevenue,
    "topkOrders"          -> OracleSqlRel.topkOrders,
    "rollupRevenue"       -> OracleSqlRel.rollupRevenue,
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
    "sqlSourceStats"      -> OracleSqlRel.sqlSourceStats,
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
    "x1SentimentMl"       -> OracleSql.x1SentimentMl,
  )
}
