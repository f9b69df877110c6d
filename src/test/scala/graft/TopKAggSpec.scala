package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** [[graft.functions.TopKAgg]] — the bounded top-k aggregate replacing
  * hot-partition `row_number` windows — checked for exact equivalence with
  * the window form on skewed input, across partial-merge boundaries. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed fixture: key "hot" holds 500 rows, "cold" holds 3, "one" 1 —
    * values interleaved so no partition is pre-sorted. */
  private lazy val skewed = {
    val rows =
      (0 until 500).map(i => ("hot", (i * 37) % 500 + 1000L, i.toLong)) ++
        Seq(("cold", 5L, 900L), ("cold", 9L, 901L), ("cold", 5L, 902L)) ++
        Seq(("one", 42L, 950L))
    rows.toDF("key", "score", "id").repartition(7, col("id"))
  }

  test("top_k(struct, k) equals row_number over (score desc, id asc)") {
    for (k <- Seq(1, 2, 10)) {
      val viaAgg = skewed.groupBy(col("key"))
        .agg(TopKAgg.topK(spark,
          struct(col("score"), (-col("id")).as("nid")), k).as("top"))
        .select(col("key"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("key"), (-col("e.nid")).as("id"),
          col("e.score").as("score"), (col("i") + 1).as("rk"))
        .as[(String, Long, Long, Int)].collect().toSet
      val viaWindow = skewed
        .withColumn("rk", row_number().over(Window.partitionBy(col("key"))
          .orderBy(col("score").desc, col("id").asc)))
        .where(col("rk") <= k)
        .select(col("key"), col("id"), col("score"), col("rk"))
        .as[(String, Long, Long, Int)].collect().toSet
      assert(viaAgg == viaWindow, s"k=$k")
    }
  }

  test("top_k result is descending and trimmed to min(k, group size)") {
    val rows = skewed.groupBy(col("key"))
      .agg(TopKAgg.topK(spark, col("score"), 5).as("top"))
      .as[(String, Seq[Long])].collect().toMap
    assert(rows("one") == Seq(42L))
    assert(rows("cold") == Seq(9L, 5L, 5L)) // duplicates kept, desc order
    assert(rows("hot").length == 5)
    assert(rows("hot") == rows("hot").sorted.reverse)
  }

  test("top_k ignores nulls and survives serialize/deserialize round trip") {
    val df = Seq(("a", Some(3L)), ("a", None), ("a", Some(7L)), ("b", None))
      .toDF("key", "v").repartition(5)
    val got = df.groupBy(col("key"))
      .agg(TopKAgg.topK(spark, col("v"), 2).as("top"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(7L, 3L))
    assert(got("b") == Seq.empty)
    // direct buffer round trip (the path distribution exercises)
    val agg = graft.functions.TopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 3)
    val buf = agg.createAggregationBuffer()
    Seq(4L, 9L, 1L, 7L).foreach { v =>
      agg.merge(buf, agg.deserialize(agg.serialize(
        scala.collection.mutable.ArrayBuffer[Any](v))))
    }
    assert(agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(9L, 7L, 4L))
  }
}
