package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch twins of the reference's one true abstraction: `processChatStream`
 * = keyBy → {tumbling | sliding | running | count} window → reduce
 * (SentimentAnalysis.scala:269-287, :304-311). The streaming forms live in
 * [[graft.streaming.StreamingOps]]; these deterministic batch forms are
 * what the DuckDB oracle verifies (SURVEY.md §5).
 *
 * Scale notes (100 TB design): every builder here is a single hash
 * aggregation / window over the grouping keys — one shuffle on the key,
 * partial (map-side) aggregation for the integer sums, no driver-side
 * collection anywhere. The ordered concat fold carries (seq, text) pairs
 * through `collect_list`, which is the unavoidable cost of the reference's
 * order-sensitive fold (SentimentAnalysis.scala:293-302); all other
 * reducers are plain integer sums.
 */
object ChatOps {

  /** Tumbling-window bucket start for non-negative integer seconds:
    * `sec - sec % width` (≡ floor(sec/width)·width). */
  def tumble(sec: Column, widthSec: Long): Column =
    (sec - pmod(sec, lit(widthSec))).cast("long")

  /** The reference's order-sensitive messageReduce fold
    * (SentimentAnalysis.scala:293-302): texts concatenated with "\n" in
    * arrival order. Arrival order is made explicit via `order` (unique per
    * group), so the fold is deterministic: sort the collected (order, text)
    * pairs, then join. */
  def orderedConcat(order: Column, text: Column): Column =
    array_join(
      transform(array_sort(collect_list(struct(order.as("o"),
        text.as("t")))), x => x.getField("t")),
      "\n")

  /** Running (unwindowed) keyed reduce, the `(0,0)` timings case of
    * SentimentAnalysis.scala:285: emits the running per-key aggregate for
    * every input record. Batch twin = analytic cumulative sum.
    *
    * Scale note: inherently serial per key — fine when key cardinality
    * grows with the data (W4 users), a single-task sort when it is FIXED
    * (W6's 5-category taxonomy). For the fixed case use
    * [[chunkedRunningSum]], the two-phase exact rewrite. */
  def runningSum(value: Column, partition: Seq[Column],
      order: Seq[Column]): Column =
    sum(value).over(Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Default chunk width (in units of the leading order column) for the
    * two-phase chunked plans below. Exactness never depends on it — any
    * width gives identical results — only parallelism does: per-key work
    * splits into history/width independent tasks. */
  val ChunkWidth = 256L

  /** Two-phase exact per-key running sum — [[runningSum]] without the
    * full-history single-task sort. Phase 1 aggregates each key's run
    * into chunk partials (chunk = leading-order-column div `chunkWidth`,
    * one hash aggregate with map-side combine) and prefix-sums the
    * PARTIALS (a window over history/chunkWidth rows per key, not over
    * raw rows); phase 2 adds each chunk's offset to a within-chunk
    * running sum whose window partition is bounded by the chunk. Chunk
    * boundaries follow the leading order column, so rows in earlier
    * chunks strictly precede rows in later ones and the decomposition is
    * exact — the ChatOpsSpec pins chunked ≡ windowed on crafted input.
    *
    * Adds column `out` to `df`; `keyNames` must be plain column names
    * (they key the offset join). */
  def chunkedRunningSum(df: DataFrame, value: Column, keyNames: Seq[String],
      order: Seq[Column], out: String,
      chunkWidth: Long = ChunkWidth): DataFrame = {
    val keyCols = keyNames.map(col)
    val withCk = df
      .withColumn("_ck", tumble(order.head.cast("long"), chunkWidth))
      .withColumn("_v", value)
    val offs = withCk
      .groupBy(keyCols :+ col("_ck"): _*)
      .agg(sum(col("_v")).as("_csum"))
      .withColumn("_off", coalesce(
        sum(col("_csum")).over(Window.partitionBy(keyCols: _*)
          .orderBy(col("_ck").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(keyCols :+ col("_ck") :+ col("_off"): _*)
    withCk
      .withColumn("_lrun",
        sum(col("_v")).over(Window.partitionBy(keyCols :+ col("_ck"): _*)
          .orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(offs, keyNames :+ "_ck")
      .withColumn(out, col("_off") + col("_lrun"))
      .drop("_ck", "_v", "_lrun", "_off")
  }

  /** Count-window toxicity fold (SentimentAnalysis.scala:304-311): per key,
    * every `n` consecutive records (by `order`) are summed; only complete
    * windows fire; keep sums <= thresholdMicro (the reference's
    * `.filter(_.value <= threshold)`, SentimentAnalysis.scala:311 — note
    * `<=`, not `<`). Input df must contain `key` and `valueMicro` columns.
    *
    * Two-phase plan (100× scale): the naive form's per-key `row_number`
    * sorts one key's ENTIRE history on one task, so wall-clock is bounded
    * by the hottest key. Here the global rank decomposes exactly into
    * chunk-offset + within-chunk rank: phase 1 counts rows per (key,
    * chunk = leading-order div `chunkWidth`) and exclusive-prefix-sums
    * those counts (window over history/chunkWidth partial rows); phase 2
    * ranks only within (key, chunk) — a partition bounded by the chunk —
    * and stitches rn = offset + local rank. Rows in earlier chunks
    * strictly precede later ones under `order` (the chunk key is a
    * monotone function of its head), so rn matches the naive global
    * row_number row for row; windows then group by rn div n as before.
    * Equivalence is pinned by ChatOpsSpec against [[countWindowSumNaive]].
    *
    * Determinism on ties: `order` should make each key's sequence unique
    * — callers append the VALUE column as the final tie-break, which
    * leaves window sums invariant under any residual permutation of fully
    * tied rows. */
  def countWindowSum(df: DataFrame, key: Column, order: Seq[Column],
      valueMicro: Column, n: Int, thresholdMicro: Long,
      chunkWidth: Long = ChunkWidth): DataFrame = {
    val ocols = order.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }
    val onames = order.indices.map(i => col(s"_o$i"))
    val base = df.select(Seq(key.as("key"), valueMicro.as("v")) ++ ocols
        :+ tumble(order.head.cast("long"), chunkWidth).as("_ck"): _*)
    val offs = base
      .groupBy(col("key"), col("_ck"))
      .agg(count(lit(1)).as("_ccnt"))
      .withColumn("_off", coalesce(
        sum(col("_ccnt")).over(Window.partitionBy(col("key"))
          .orderBy(col("_ck").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("key"), col("_ck"), col("_off"))
    base
      .withColumn("_lrn", row_number().over(
        Window.partitionBy(col("key"), col("_ck")).orderBy(onames: _*)))
      .join(offs, Seq("key", "_ck"))
      .withColumn("rn", col("_off") + col("_lrn"))
      .withColumn("grp", expr(s"(rn - 1) div $n"))
      .groupBy(col("key"), col("grp"))
      .agg(sum(col("v")).as("mood_micro"), count(lit(1)).as("cnt"))
      .where(col("cnt") === n && col("mood_micro") <= thresholdMicro)
      .drop("cnt")
  }

  /** The single-window reference form of [[countWindowSum]] — kept as the
    * equivalence oracle for the chunked plan's spec (and the clearest
    * statement of the semantics). */
  private[graft] def countWindowSumNaive(df: DataFrame, key: Column,
      order: Seq[Column], valueMicro: Column, n: Int,
      thresholdMicro: Long): DataFrame = {
    val rn = row_number().over(Window.partitionBy(key).orderBy(order: _*))
    df.withColumn("rn", rn)
      .select(key.as("key"), valueMicro.as("v"), col("rn"))
      .withColumn("grp", expr(s"(rn - 1) div $n"))
      .groupBy(col("key"), col("grp"))
      .agg(sum(col("v")).as("mood_micro"), count(lit(1)).as("cnt"))
      .where(col("cnt") === n && col("mood_micro") <= thresholdMicro)
      .drop("cnt")
  }
}
