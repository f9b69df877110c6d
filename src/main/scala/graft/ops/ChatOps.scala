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
    * every input record. Batch twin = analytic cumulative sum. */
  def runningSum(value: Column, partition: Seq[Column],
      order: Seq[Column]): Column =
    sum(value).over(Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Count-window toxicity fold (SentimentAnalysis.scala:304-311): per key,
    * every `n` consecutive records (by `order`) are summed; only complete
    * windows fire; keep sums <= thresholdMicro (the reference's
    * `.filter(_.value <= threshold)`, SentimentAnalysis.scala:311 — note
    * `<=`, not `<`). Input df must contain `key` and `valueMicro` columns.
    *
    * 100× scale note: the per-key `row_number` sorts one key's history on
    * one task, so wall-clock is bounded by the hottest key. The fixture
    * derivation scales key cardinality with data (Messages.scala), which
    * keeps tasks balanced; for a genuinely hot key the two-phase plan is:
    * (1) map-side, pre-aggregate fixed-size chunks of each key's run
    * (chunk id = order div C) into (count, sum) partials; (2) reduce-side,
    * stitch partials into exact n-element windows — or run the streaming
    * form ([[graft.streaming.StreamingOps.toxicWindows]]), whose per-key
    * state is O(1) and which shards across executors by key hash. */
  def countWindowSum(df: DataFrame, key: Column, order: Seq[Column],
      valueMicro: Column, n: Int, thresholdMicro: Long): DataFrame = {
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
