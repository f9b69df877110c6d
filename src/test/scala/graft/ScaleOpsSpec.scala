package graft

import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** The cluster-scale join levers ([[graft.ops.ScaleOps]]): bucketed
  * tables must join with NO shuffle on either side, and the salted join
  * must be result-identical to the plain join on skewed input. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    ScaleOps.writeBucketed(
      docs.select(col("doc_id"), col("n_chars")), "g_len", 8, "doc_id")
    ScaleOps.writeBucketed(
      docs.select(col("doc_id"), col("source")), "g_src", 8, "doc_id")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion exercises the bucket
      // co-location, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("g_len").join(spark.table("g_src"), "doc_id")
      val rows = j.count()
      assert(rows == docs.count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      // same result as the plain parquet-scan join
      val plain = docs.select(col("doc_id"), col("n_chars"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      assert(j.orderBy("doc_id").collect().toSeq ==
        plain.orderBy("doc_id").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_len")
      spark.sql("DROP TABLE IF EXISTS g_src")
    }
  }

  test("saltedJoin equals the plain join on skewed input") {
    // 900 of 1000 rows share one hot key
    val big = (0 until 1000)
      .map(i => (if (i < 900) "hot" else s"k${i % 17}", i.toLong))
      .toDF("key", "payload").repartition(7)
    val small = Seq(("hot", 1L), ("k3", 2L), ("k5", 3L), ("missing", 4L))
      .toDF("key", "dim")
    for (salts <- Seq(1, 4, 16)) {
      val salted = ScaleOps.saltedJoin(big, small, "key", salts)
        .select("key", "payload", "dim")
        .as[(String, Long, Long)].collect().toSeq.sorted
      val plain = big.join(small, Seq("key"))
        .select("key", "payload", "dim")
        .as[(String, Long, Long)].collect().toSeq.sorted
      assert(salted == plain, s"salts=$salts")
      assert(salted.count(_._1 == "hot") == 900) // every hot row joined
    }
  }
}
