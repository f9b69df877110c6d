package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.pipeline.RelOps
import graft.sources.DataContract

/** The ingestion data contract and Verify's loud-failure path — the two
  * guards added after the round-8 incident where a timestamp-encoding
  * drift made 20 queries silently vanish from the correctness report. */
class DataContractSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  /** A tmp sf dir whose events table carries a DRIFTED ts dtype (string)
    * next to healthy documents/embeddings copies. */
  private lazy val driftedDir: String = {
    val dir = Files.createTempDirectory("graft-contract").toString
    spark.read.parquet(s"$SF/documents.parquet").limit(5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$SF/embeddings.parquet").limit(5)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    RelOps.events(spark, SF).limit(5)
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("contract is clean on the shipped testdata") {
    assert(DataContract.violations(spark, SF).isEmpty)
  }

  test("a ts-dtype swap goes red naming the drifted column") {
    val v = DataContract.violations(spark, driftedDir)
    assert(v.exists(x => x.table == "events" && x.column == "ts" &&
      x.problem.contains("string")), v.mkString("; "))
    val err = intercept[IllegalStateException] {
      DataContract.check(spark, driftedDir)
    }
    assert(err.getMessage.contains("events.ts"))
  }

  test("normalized events loader accepts legacy ns-long files") {
    // write a legacy-convention file (ts already epoch-ns BIGINT) and
    // confirm the loader passes it through unchanged
    val dir = Files.createTempDirectory("graft-nslong").toString
    val want = RelOps.events(spark, SF).limit(50)
    want.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = RelOps.events(spark, dir)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    // (epoch-ns sums overflow long; compare the value sets instead)
    assert(back.select("ts").collect().map(_.getLong(0)).sorted.toSeq ==
      want.select("ts").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("Verify writes a red marker parquet for a failing query") {
    val out = Files.createTempDirectory("graft-verify-red").toString
    Verify.run(spark, driftedDir, out, only = Set("eventsHourly"))
    // the failing query must leave readable output the driver WILL
    // compare (and mismatch) — never an absent entry
    val marker = spark.read.parquet(s"$out/eventsHourly")
    assert(marker.columns.toSeq == Seq("_graft_query_failed"))
    assert(marker.head.getString(0).startsWith("FAILED:"))
    val failJson = Files.readString(
      java.nio.file.Paths.get(s"$out/verify_failures.json"))
    assert(failJson.contains("eventsHourly"))
    assert(failJson.contains("events.ts"), failJson.take(300))
  }
}
