package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DataContract

/** The scale-fixture synthesizer must produce a corpus the engine
  * treats exactly like a bigger data drop: contract-clean, counts
  * multiplied, every modulus split preserved, replica vocabularies
  * disjoint. Pinned at 2× of sf0.001 so the BASELINE.md scaling
  * exponents rest on tooling that stays correct. */
class ScaleFixtureSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-scale2x").toString
    ScaleFixture.build(spark, SF, d, 2)
    d
  }

  test("the scaled dir passes the data contract") {
    assert(DataContract.violations(spark, dir).isEmpty)
  }

  test("replication multiplies counts and preserves the modulus splits") {
    def n(d: String, t: String) =
      spark.read.parquet(s"$d/$t.parquet").count()
    Seq("documents", "events", "orders", "lineitem", "customer",
      "supplier", "part").foreach { t =>
      assert(n(dir, t) == 2 * n(SF, t), t)
    }
    // fixed dims copy 1:1
    Seq("nation", "region").foreach { t =>
      assert(n(dir, t) == n(SF, t), t)
    }
    // embeddings scale under the production ANN model: the corpus
    // replicates but the standard query set (vec_id % 50 = 0) stays
    // exactly replica 0's
    val e1 = spark.read.parquet(s"$SF/embeddings.parquet")
    val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
    val q1 = e1.where(col("vec_id") % 50 === 0).count()
    assert(e2.count() == 2 * e1.count() - q1)
    assert(e2.where(col("vec_id") % 50 === 0).count() == q1)
    // decontamination benchmark fraction (doc_id % 97) scales with the
    // corpus, so the stand-in keeps its meaning
    def bench(d: String) = spark.read.parquet(s"$d/documents.parquet")
      .where(col("doc_id") % 97 === 0).count()
    assert(bench(dir) == 2 * bench(SF))
    // replica ids are disjoint from the originals
    assert(spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").distinct().count() ==
      2 * spark.read.parquet(s"$SF/documents.parquet")
        .select("doc_id").distinct().count())
  }

  test("replica vocabularies are disjoint, so dedup sees new content") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.WordGramsExpr.grams(
        spark, col("text"), 1, distinct = true)).as("tok"))
    val prefixed = toks.where(col("tok").startsWith("r1_")).count()
    val plain = toks.where(!col("tok").startsWith("r1_")).count()
    assert(prefixed > 0 && plain > 0)
    // cross-replica exact-dup collisions cannot exist: md5(text) counts
    // must be exactly 2x the originals' (each replica dedups internally
    // like the original, never against the other)
    val groups = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(md5(col("text"))).count()
    val origGroups = spark.read.parquet(s"$SF/documents.parquet")
      .groupBy(md5(col("text"))).count()
    assert(groups.count() == 2 * origGroups.count())
  }

  test("decorrelation is injective over the full 2·dim replica period") {
    // one fixed base vector, transformed by every replica index in
    // [0, 2·dim): all 2·dim results must be pairwise distinct — the
    // shift alone has period dim (k and k + dim were clones); the
    // per-period sign flip extends the period to 2·dim
    val dim = 8
    val base = (1 to dim).map(_.toDouble).toArray
    val rows = (0 until 2 * dim).map { k =>
      spark.range(1).select(lit(k).as("k"),
        (if (k == 0) lit(base) else ScaleFixture.decorrelated(
          lit(base), k, dim)).as("e"))
    }.reduce(_ unionAll _).collect()
    val vecs = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toVector)
      .toMap
    assert(vecs.size == 2 * dim)
    for (a <- 0 until 2 * dim; b <- (a + 1) until 2 * dim)
      assert(vecs(a) != vecs(b), s"replicas $a and $b are clones")
    // norm-preserving in every case
    val n0 = vecs(0).map(x => x * x).sum
    vecs.values.foreach(v => assert(v.map(x => x * x).sum == n0))
  }

  test("build refuses replica counts past the decorrelation period") {
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.build(spark, SF, "/tmp/graft-scale-overflow", 1000)
    }
    assert(e.getMessage.contains("replicas"))
  }

  test("embedding replicas are norm-preserving dimension cycles, decorrelated") {
    val e1 = spark.read.parquet(s"$SF/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val e2 = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") >= ScaleFixture.VecOff)
      .select((col("vec_id") - ScaleFixture.VecOff).as("vec_id"),
        col("embedding").as("emb2"))
    val j = e1.join(e2, Seq("vec_id")).persist()
    // same value multiset per vector (norms and distributions preserved)
    assert(j.count() > 0 &&
      j.where(array_sort(col("embedding")) =!= array_sort(col("emb2")))
        .count() == 0)
    // but genuinely cycled — replicas are not clones of the originals
    assert(j.where(col("embedding") === col("emb2")).count() < j.count())
    j.unpersist()
  }

  test("a TPC-H join query returns exactly doubled aggregate rows") {
    // q1Pricing groups by (returnflag, linestatus) — same groups, but
    // the doubled lineitem doubles every count
    val r1 = graft.pipeline.RelOps.q1Pricing(spark, SF)
      .select("l_returnflag", "l_linestatus", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val r2 = graft.pipeline.RelOps.q1Pricing(spark, dir)
      .select("l_returnflag", "l_linestatus", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(r1.nonEmpty && r1.keySet == r2.keySet)
    r1.foreach { case (k, v) => assert(r2(k) == 2 * v, k) }
  }
}
