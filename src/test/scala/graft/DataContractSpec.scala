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

  test("contract survives a TIMESTAMP(NANOS)-annotated events file on a fresh session") {
    // a TRUE legacy file: INT64 annotated TIMESTAMP(NANOS), which Spark
    // schema inference rejects outright unless nanosAsLong is set — the
    // unannotated-INT64 case below never exercises that path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val dir = Files.createTempDirectory("graft-nanosann").toString
    spark.read.parquet(s"$SF/documents.parquet").limit(5)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$SF/embeddings.parquet").limit(5)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(
        true, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType())
        .named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    (1 to 3).foreach { i =>
      w.write(f.newGroup()
        .append("event_id", i.toLong)
        .append("ts", 1700000000000000000L + i)
        .append("user_id", i.toLong)
        .append("event_type", Binary.fromString("view"))
        .append("value", 1.5)
        .append("props", Binary.fromString("{}")))
    }
    w.close()
    // fresh session = the Verify situation: nanosAsLong not yet set
    val s2 = spark.newSession()
    assert(s2.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ != "true"))
    assert(DataContract.violations(s2, dir).isEmpty)
    // and the normalized loader reads it as the legacy LongType branch
    val back = RelOps.events(s2, dir)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(back.count() == 3)
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
