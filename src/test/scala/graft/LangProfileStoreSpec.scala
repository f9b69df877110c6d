package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.DataOps
import graft.sources.LangProfileStore

/** The persistent language-profile store ([[LangProfileStore]], K6)
  * must be a lossless round-trip: profiles are exact integers (trigram
  * hash, rank), so classifying against the read-back store is
  * IDENTICAL to scoring against the freshly trained profile relation,
  * and one build serves any number of probe batches. */
class LangProfileStoreSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang", "lang_pred", "dist")
      .as[(Long, String, String, Long)].collect().toSet

  test("appendBatch merge is batch-decomposition-invariant == one-shot train") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    def rels(dir: String) = Seq("counts", "profiles").map { rel =>
      rel -> spark.read.parquet(s"$dir/$rel")
        .collect().map(_.toSeq).toSet
    }.toMap
    val full = Files.createTempDirectory("graft-lang-one").toString
    LangProfileStore.buildFrom(spark, d, full)
    // build(third) + append(third) + append(third), counts AND ranked
    // profiles relation-identical to the one-shot train
    val inc = Files.createTempDirectory("graft-lang-three").toString
    LangProfileStore.buildFrom(spark, d.where(col("doc_id") % 3 === 0), inc)
    LangProfileStore.appendBatch(spark, d.where(col("doc_id") % 3 === 1), inc)
    LangProfileStore.appendBatch(spark, d.where(col("doc_id") % 3 === 2), inc)
    assert(rels(inc) == rels(full))
    // and the registry entry == the self-trained batch classifier
    val got = rows(LangProfileStore.langIdIncremental(spark, SF))
    assert(got == rows(DataOps.langIdNgram(spark, SF)) && got.nonEmpty)
  }

  test("removeBatch inverts appendBatch; langIdRemoved == the stored split") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    def rels(dir: String) = Seq("counts", "profiles").map { rel =>
      rel -> spark.read.parquet(s"$dir/$rel")
        .collect().map(_.toSeq).toSet
    }.toMap
    val dir = Files.createTempDirectory("graft-lang-life").toString
    LangProfileStore.buildFrom(spark, d.where(col("doc_id") % 2 === 0), dir)
    val s0 = rels(dir)
    LangProfileStore.appendBatch(spark, d.where(col("doc_id") % 2 === 1), dir)
    LangProfileStore.removeBatch(spark, d.where(col("doc_id") % 2 === 1), dir)
    assert(rels(dir) == s0)
    // registry deletion round-trip == the evens-trained split form
    val got = rows(LangProfileStore.langIdRemoved(spark, SF))
    assert(got == rows(LangProfileStore.langIdStored(spark, SF)) &&
      got.nonEmpty)
  }

  test("langIdStored == classifying the odd half against a fresh-model score") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val train = d.where(col("doc_id") % 2 === 0)
    val probe = d.where(col("doc_id") % 2 === 1)
    // no store: score directly against the in-plan trained profiles
    val direct = rows(DataOps.ctScoreCounts(
      DataOps.ctGramCounts(spark, probe),
      DataOps.ctProfilesFromCounts(DataOps.ctGramCounts(spark, train))))
    val stored = rows(LangProfileStore.langIdStored(spark, SF))
    assert(stored == direct && stored.nonEmpty)
    // scope: only the odd (probe) half is ever classified
    assert(stored.forall(_._1 % 2 == 1))
    // the store-trained profiles generalize: most predictions must be
    // real labels, not the no-profile fallback
    assert(stored.count(_._3 != "und") > stored.size / 2)
  }

  test("one build serves two probe batches") {
    val dir = Files.createTempDirectory("graft-langstore").toString
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    LangProfileStore.buildFrom(spark, d.where(col("doc_id") % 2 === 0), dir)
    val b1 = d.where(col("doc_id") % 4 === 1)
    val b2 = d.where(col("doc_id") % 4 === 3)
    val got = rows(LangProfileStore.classifyAgainst(spark, b1, dir)) ++
      rows(LangProfileStore.classifyAgainst(spark, b2, dir))
    val whole = rows(LangProfileStore.classifyAgainst(spark,
      d.where(col("doc_id") % 2 === 1), dir))
    // batch boundaries are invisible: per-doc work only
    assert(got == whole && got.nonEmpty)
  }

  test("statsOf telemetry tracks every lifecycle mutation") {
    val d = spark.read.parquet(s"$SF/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    def stats(dir: String) =
      LangProfileStore.statsOf(spark, dir).collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("graft-lang-tel").toString
    LangProfileStore.buildFrom(spark, d.where(col("doc_id") % 2 === 0), dir)
    val evens = stats(dir)
    // append moves the count checksum; subtraction restores exactly
    LangProfileStore.appendBatch(spark,
      d.where(col("doc_id") % 2 === 1), dir)
    val full = stats(dir)
    assert(full != evens)
    LangProfileStore.removeBatch(spark,
      d.where(col("doc_id") % 2 === 1), dir)
    assert(stats(dir) == evens)
    // count sums: the maintained store's telemetry == a one-shot
    // full-corpus train's, and the registry form reads exactly that
    val fullDir = Files.createTempDirectory("graft-lang-tel-full").toString
    LangProfileStore.buildFrom(spark, d, fullDir)
    assert(full == stats(fullDir))
    assert(LangProfileStore.langStats(spark, SF)
      .collect().map(_.toSeq).toSet == stats(fullDir))
  }
}
