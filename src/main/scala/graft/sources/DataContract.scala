package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ingestion data contract over the engine's input tables — the guard that
 * turns a silent upstream format drift into a loud, named failure.
 *
 * Motivation (round-8 incident): the events table's physical timestamp
 * encoding changed between data drops (INT64 nanos → `timestamp[us]`) and
 * every downstream `ts` expression failed analysis; because failures were
 * swallowed per-query, the correctness report silently SHRANK instead of
 * going red. [[graft.Verify]] now runs [[check]] FIRST, so the next drift
 * fails with a message naming the drifted column before any query runs.
 *
 * Scale shape: schema inspection is metadata-only (parquet footers); the
 * only data touched is one `LIMIT 1` null-probe per id column. The probe
 * short-circuits at the first VIOLATING row (a broken table fails fast);
 * a healthy table pays one single-column scan — at 100 TB either run the
 * contract on a sampled partition subset or swap the probe for a
 * footer-statistics read; the schema/dtype checks stay metadata-only
 * either way.
 */
object DataContract {

  final case class Violation(table: String, column: String, problem: String)

  /** Required columns per input table (a superset is fine — extra columns
    * are not drift; queries select what they need). */
  private val Required: Seq[(String, Seq[String])] = Seq(
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Id column per table; must contain no NULLs. */
  private val IdCols: Map[String, String] = Map(
    "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Acceptable dtypes — the set each loader knows how to normalize, not
    * one frozen physical encoding (`ts` deliberately accepts both the
    * legacy ns-long and current µs-timestamp forms; see
    * [[graft.pipeline.RelOps.events]]). */
  private def typeOk(table: String, column: String, dt: DataType): Boolean =
    (table, column) match {
      case ("events", "ts") =>
        dt == LongType || dt == TimestampType || dt == TimestampNTZType
      case ("events", "event_id") | ("events", "user_id") => dt == LongType
      case ("events", "value") => dt == DoubleType
      case ("events", "event_type") | ("events", "props") => dt == StringType
      case ("documents", "doc_id") | ("documents", "n_chars") => dt == LongType
      case ("documents", _) => dt == StringType
      case ("embeddings", "vec_id") => dt == LongType
      case ("embeddings", "label") => dt == IntegerType || dt == LongType
      case ("embeddings", "embedding") => dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      case _ => true
    }

  /** Every contract violation in the sf directory (empty = healthy).
    *
    * Sets the same idempotent `nanosAsLong` conf as
    * [[graft.pipeline.RelOps.events]] before touching any schema: without
    * it, a legacy TIMESTAMP(NANOS)-annotated events file — an encoding
    * [[typeOk]] explicitly accepts as the LongType branch — would crash
    * parquet schema inference with an "Illegal Parquet type" error before
    * a single Violation is produced, turning supported data into a
    * false-positive RED contract failure on a fresh session. */
  def violations(spark: SparkSession, sfDir: String): Seq[Violation] = {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(nanosKey).forall(_ != "true"))
      spark.conf.set(nanosKey, "true")
    Required.flatMap { case (table, cols) =>
      val df = spark.read.parquet(s"$sfDir/$table.parquet")
      val names = df.schema.fieldNames.toSet
      val missing = cols.filterNot(names)
        .map(c => Violation(table, c, "missing column"))
      val badType = cols.filter(names).flatMap { c =>
        val dt = df.schema(c).dataType
        if (typeOk(table, c, dt)) None
        else Some(Violation(table, c, s"unsupported dtype ${dt.simpleString}"))
      }
      val nullId = IdCols.get(table).filter(names).flatMap { id =>
        if (df.where(col(id).isNull).limit(1).count() > 0)
          Some(Violation(table, id, "NULL id value"))
        else None
      }
      missing ++ badType ++ nullId
    }
  }

  /** Throws an [[IllegalStateException]] naming every drifted column. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val v = violations(spark, sfDir)
    if (v.nonEmpty) throw new IllegalStateException(
      "data contract violated: " + v
        .map(x => s"${x.table}.${x.column} (${x.problem})").mkString("; "))
  }
}
