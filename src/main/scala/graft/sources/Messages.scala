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
 *   bucket   = doc_id div 3          // 3 consecutive docs per group
 *   seq      = doc_id                // arrival order
 *   tsec     = bucket                // event-time seconds since t0
 *   channel  = 'ch' || bucket % 4
 *   username = 'u'  || bucket % 10
 *   text     = documents.text
 * }}}
 * Each bucket lands in one 1-second tumbling window of one (channel, user)
 * key, giving the reference's W1 concat fold 3 texts per group; distinct
 * `tsec` per bucket keeps per-user window counts growing with data size so
 * the count-window toxicity operators keep firing at every scale factor.
 */
object Messages {

  /** The derived message stream: seq, tsec, channel, username, text. */
  def messages(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bucket = expr("doc_id div 3")
    docs.select(
      col("doc_id").as("seq"),
      bucket.as("tsec"),
      concat(lit("ch"), (bucket % 4).cast("string")).as("channel"),
      concat(lit("u"), (bucket % 10).cast("string")).as("username"),
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
