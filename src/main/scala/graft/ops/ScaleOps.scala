package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cluster-scale join utilities (builder brief: "Co-locate joins via
 * bucketing or pre-partitioning, salting for skew"). Nothing here changes
 * a query's RESULT — these are the physical-layout levers a 100 TB
 * deployment pulls when the default shuffle becomes the bottleneck.
 */
object ScaleOps {

  /** Persist `df` as a bucketed + per-bucket-sorted managed table. Two
    * tables bucketed the same way on their join key then join WITHOUT a
    * shuffle on either side: the bucket scan already carries the
    * HashPartitioning the join requires (EnsureRequirements inserts no
    * Exchange), so at 100 TB the join cost is a local merge per bucket —
    * the pre-shuffle is paid ONCE at write time and amortized over every
    * downstream join. Bucket count should be sized so one bucket of the
    * LARGER table fits an executor core's working set. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    // explicit path => EXTERNAL table (data under the caller's scratch
    // dir instead of the session warehouse — the registry entries'
    // tmpStoreDir discipline)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Skew-safe exact equi-join of a big frame against a SMALL one on
    * `key`: the big side scatters each row into one of `salts` salt
    * buckets (deterministically, by a hash of the whole row) and the
    * small side replicates across all of them, so one hot key's rows
    * spread over `salts` reducers instead of serializing on one. Result
    * is EXACTLY `big.join(small, key)` — salting only re-shards the
    * shuffle. Prefer AQE's skew-join handling when both sides are large;
    * this is the explicit form for the hot-key×small-dim case (AQE can't
    * split a broadcast-ineligible skewed build side replicated this
    * cheaply).
    *
    * `small` must not contain a `_salt` column; its rows are duplicated
    * `salts` times, so keep it to genuinely small relations. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
