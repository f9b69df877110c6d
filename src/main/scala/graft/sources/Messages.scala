package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic derivation of the reference's wire-format message stream
 * (`channel,user,text` lines read from a TCP socket,
 * SentimentAnalysis.scala:41-48) from the driver's read-only `documents`
 * table — so that the DuckDB oracle can rebuild the exact same stream
 * (FIXTURES.md §2).
 *
 * Derivation (mirrored in [[graft.oracle.OracleSql.msgsCte]]):
 * {{{
 *   bucket   = doc_id div 3            // 3 consecutive docs per group
 *   nb       = max(doc_id) div 3 + 1   // bucket count (scalar, broadcast)
 *   U        = greatest(3, nb div 64)  // user count GROWS with data size
 *   seq      = doc_id                  // arrival order
 *   tsec     = bucket * 6              // event-time seconds since t0
 *   channel  = 'ch' || bucket % 4
 *   username = 'u'  || bucket % U
 *   text     = documents.text
 * }}}
 *
 * Why these constants:
 *  - Each bucket lands in one 1-second tumbling window of one
 *    (channel, user) key, giving the reference's W1 concat fold 3 texts
 *    per group.
 *  - `tsec` advances 6 s per bucket so the 30 s tumbling entity windows
 *    (W7) number ≥ 25 per entity even at the smallest fixture (167
 *    buckets → 1002 s → 34 windows), which lets the countWindow(25)
 *    toxicity operator (W8) complete windows at every scale factor.
 *  - `U` scales with the data (≈ one user per 64 buckets, floor 3):
 *    at the sf0.01 gate U=3 (55 rows/user → countWindow(50) completes);
 *    at sf0.1 U=26; at 1000× the user-keyed running/count windows
 *    partition across ~nb/64 keys instead of a constant 10 — the skew
 *    fix VERDICT.md round 1 asked for. The scalar `nb` is computed with
 *    one tiny aggregation broadcast-joined to the scan (no collect, no
 *    second full pass at runtime: Spark plans it as a broadcast nested
 *    loop of a 1-row relation).
 */
object Messages {

  /** The derived message stream: seq, tsec, channel, username, text. */
  def messages(spark: SparkSession, sfDir: String): DataFrame =
    fromDocs(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Derivation over any (doc_id, text) relation — unit-testable form. */
  def fromDocs(docs: DataFrame): DataFrame = {
    val nb = docs.agg((expr("max(doc_id) div 3") + lit(1L)).as("nb"))
    val bucket = expr("doc_id div 3")
    val users = greatest(lit(3L), expr("nb div 64"))
    docs.crossJoin(broadcast(nb)).select(
      col("doc_id").as("seq"),
      (bucket * 6).as("tsec"),
      concat(lit("ch"), (bucket % 4).cast("string")).as("channel"),
      concat(lit("u"), (bucket % users).cast("string")).as("username"),
      col("text"))
  }

  /** Raw `channel,user,text` wire lines with commas injected into the text
    * body (replace " the " -> ", the ") to exercise the reference's
    * split-with-limit-3 parse semantics (SentimentAnalysis.scala:45-48:
    * fields 0,1 then the rest re-joined — text may contain commas). */
  def wireLines(spark: SparkSession, sfDir: String): DataFrame =
    messages(spark, sfDir).select(
      col("seq"),
      concat_ws(",", col("channel"), col("username"),
        regexp_replace(col("text"), lit(" the "), lit(", the ")))
        .as("line"))
}
