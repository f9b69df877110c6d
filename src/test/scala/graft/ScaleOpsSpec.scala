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

  test("saltedJoin spreads a hot key over many partitions where the plain join serializes it") {
    val big = (0 until 2000)
      .map(i => (if (i < 1900) "hot" else s"k${i % 17}", i.toLong))
      .toDF("key", "payload").repartition(7)
    val small = (0 until 64).map(i => (s"k$i", i.toLong))
      .toDF("key", "dim").union(Seq(("hot", 99L)).toDF("key", "dim"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle path (the 100 TB shape: the per-key dim is
      // too big to broadcast) and disable AQE so the assertion reads
      // the static partitioning, not a runtime re-plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def hotPartitions(df: org.apache.spark.sql.DataFrame): Long =
        df.where(col("key") === "hot")
          .select(org.apache.spark.sql.functions.spark_partition_id()
            .as("p"))
          .distinct().count()
      // plain join: every hot row lands on ONE reducer
      assert(hotPartitions(big.join(small, Seq("key"))) == 1L)
      // salted join: the hot key spreads across shards
      val spread =
        hotPartitions(ScaleOps.saltedJoin(big, small, "key", 8))
      assert(spread > 1L, s"hot key still on $spread partition(s)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("component hop joins split under AQE skew handling on a mega dup-family") {
    // A crawl-scale mega dup-family is the hot key of the components
    // loop: its hub is hot on doc_b in the hop join, its min label hot
    // on rep1 in the jump. Both sides are dup-subgraph-sized (salting's
    // small-side replication doesn't apply), so the shipped guard is
    // AQE skew splitting — pin that the EXACT join shape the loop
    // executes ([[graft.pipeline.DataOps.componentRound]]) is eligible:
    // sort-merge, no partitioning requirement downstream, and AQE marks
    // the skewed sides (skew=true) once the thresholds trip.
    val n = 200000
    val star = spark.range(1, n.toLong)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
    val edges = star.union(
      star.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    // labels enter every REAL round as a lineage-free localCheckpoint
    // scan (connectedComponents checkpoints per round) — that is what
    // makes the skewed joins splittable: both join inputs are plain
    // exchanges, where an aggregate-produced side (co-partitioned, no
    // exchange under the join) could not be split
    val labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("rep", col("doc_id")).localCheckpoint(true)
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      // trip the skew detector at fixture scale: the star hub's
      // partition dwarfs the 1 KB advisory size; production keeps the
      // defaults (256 MB) — only the THRESHOLDS are test-scaled here
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "false")
      val round = graft.pipeline.DataOps.componentRound(edges, labels)
      // one round of hash-min over a star labels every node 0
      // (collect ROUND itself so the inspected plan is the executed,
      // AQE-finalized one)
      val out = round.collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(out.length == n && out.forall(_._2 == 0L))
      val plan = round.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot-family join:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("retentionCohorts runs its cohort join salted, result unchanged") {
    val j = graft.pipeline.EventOps.retentionCohorts(spark,
      "/root/testdata/sf0.001")
    // the salt is IN the executed plan (the production skew guard is
    // wired, not spec-only) ...
    assert(j.queryExecution.executedPlan.toString.contains("_salt"),
      "no salt in the cohort join plan")
    // ... and the output column surface is untouched (the registry
    // oracle hash-audits value equality with the unsalted definition)
    assert(j.columns.toSeq ==
      Seq("cohort_day", "day_offset", "n_users"))
    assert(j.count() > 0)
  }
}
