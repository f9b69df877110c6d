package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.{CorpusSink, DsirStore, Forget, LangProfileStore,
  MinhashIndex, PositionsIndex, PostingsIndex}

/** Property checks of the persistent-store LIFECYCLE invariants beyond
  * the suites' fixed even/odd splits: for RANDOM corpora and RANDOM
  * batch partitions, (1) any decomposition build(p0)+append(p1)+...
  * yields the store CONTENTS of a one-shot build, and (2) removing a
  * random subset leaves exactly a build over the survivors — the
  * additive-merge / exact-inverse claims as algebraic laws, not
  * fixture facts. ScalaCheck generators driven with deterministic
  * seeds (the scalatest-scalacheck bridge isn't on the offline
  * classpath); case counts kept small — each case is several Spark
  * jobs. */
class StoreLifecyclePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(77L + i)))

  // small random corpora: 6-14 docs, 3-9 words each, tiny vocabulary
  // so shingles/tokens collide across docs (the interesting case)
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(6, 14)
    texts <- Gen.listOfN(n, for {
      w <- Gen.chooseNum(3, 9)
      ws <- Gen.listOfN(w, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "epsilon", "zeta", "eta", "theta"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val splitGen: Gen[(Seq[(Long, String)], Seq[Int])] = for {
    c <- corpusGen
    parts <- Gen.listOfN(c.length, Gen.chooseNum(0, 2))
  } yield (c, parts)

  private def rels(dir: String, names: Seq[String]) = names.map { r =>
    r -> spark.read.parquet(s"$dir/$r").collect().map(_.toSeq).toSet
  }.toMap

  test("postings/minhash/positions: random 3-way decompositions == one-shot build") {
    for (((corpus, parts), k) <- cases(splitGen, 3).zipWithIndex) {
      val df = corpus.toDF("doc_id", "text")
      val batches = (0 to 2).map { p =>
        corpus.zip(parts).collect { case (d, q) if q == p => d }
          .toDF("doc_id", "text")
      }
      // one-shot vs decomposed, per store kind
      val onePos = Files.createTempDirectory(s"prop-pos-one$k").toString
      val incPos = Files.createTempDirectory(s"prop-pos-inc$k").toString
      PositionsIndex.buildFrom(spark, df, onePos)
      PositionsIndex.buildFrom(spark, batches(0), incPos)
      PositionsIndex.appendBatch(spark, batches(1), incPos)
      PositionsIndex.appendBatch(spark, batches(2), incPos)
      assert(rels(incPos, Seq("positions")) == rels(onePos, Seq("positions")))

      val onePst = Files.createTempDirectory(s"prop-pst-one$k").toString
      val incPst = Files.createTempDirectory(s"prop-pst-inc$k").toString
      PostingsIndex.buildFrom(spark, df, onePst)
      PostingsIndex.buildFrom(spark, batches(0), incPst)
      PostingsIndex.appendBatch(spark, batches(1), incPst)
      PostingsIndex.appendBatch(spark, batches(2), incPst)
      val prels = Seq("postings", "doclen", "vocab", "stats")
      assert(rels(incPst, prels) == rels(onePst, prels))

      val oneMh = Files.createTempDirectory(s"prop-mh-one$k").toString
      val incMh = Files.createTempDirectory(s"prop-mh-inc$k").toString
      MinhashIndex.build(spark, df, oneMh)
      MinhashIndex.build(spark, batches(0), incMh)
      MinhashIndex.appendBatch(spark, batches(1), incMh)
      MinhashIndex.appendBatch(spark, batches(2), incMh)
      val mrels = Seq("shingles", "bands")
      assert(rels(incMh, mrels) == rels(oneMh, mrels))
    }
  }

  test("postings: removing a random subset == build over the survivors") {
    for (((corpus, parts), k) <- cases(splitGen, 3).zipWithIndex) {
      val victims = corpus.zip(parts).collect { case (d, 0) => d }
      val survivors = corpus.zip(parts).collect { case (d, q) if q != 0 => d }
      val full = Files.createTempDirectory(s"prop-rm-full$k").toString
      val want = Files.createTempDirectory(s"prop-rm-want$k").toString
      PostingsIndex.buildFrom(spark, corpus.toDF("doc_id", "text"), full)
      PostingsIndex.removeBatch(spark,
        victims.map(_._1).toDF("doc_id"), full)
      PostingsIndex.buildFrom(spark,
        survivors.toDF("doc_id", "text"), want)
      val prels = Seq("postings", "doclen", "vocab", "stats")
      assert(rels(full, prels) == rels(want, prels),
        s"case $k victims=${victims.map(_._1)}")
    }
  }

  test("composed forget: random victims leave survivors-only surfaces") {
    // random LABELED corpora (two languages) so the corpus partitions,
    // the language profiles and the importance stats all have structure
    val labeledGen: Gen[(Seq[(Long, String, String)], Seq[Boolean])] = for {
      (c, parts) <- splitGen
      langs <- Gen.listOfN(c.length, Gen.oneOf("aa", "bb"))
    } yield (c.zip(langs).map { case ((id, t), l) => (id, l, t) },
      parts.map(_ == 0))
    for (((corpus, victimFlags), k) <- cases(labeledGen, 3).zipWithIndex) {
      val df = corpus.toDF("doc_id", "lang", "text")
      val victims = corpus.zip(victimFlags).collect { case (d, true) => d }
      val survivors = corpus.zip(victimFlags)
        .collect { case (d, false) => d }
      val dir = Files.createTempDirectory(s"prop-forget$k").toString
      CorpusSink.appendCurated(df, s"$dir/corpus")
      PostingsIndex.buildFrom(spark,
        df.select(col("doc_id"), col("text")), s"$dir/postings")
      MinhashIndex.build(spark,
        df.select(col("doc_id"), col("text")), s"$dir/minhash")
      LangProfileStore.buildFrom(spark, df, s"$dir/lang")
      DsirStore.buildFrom(spark, df, s"$dir/dsir")
      Forget.forget(spark, victims.map(_._1).toDF("doc_id"),
        s"$dir/corpus", s"$dir/postings", s"$dir/minhash",
        None, None, None, Some(s"$dir/lang"), Some(s"$dir/dsir"))
      // every surface == built over the survivors from scratch
      val want = Files.createTempDirectory(s"prop-forget-want$k").toString
      val sdf = survivors.toDF("doc_id", "lang", "text")
      PostingsIndex.buildFrom(spark,
        sdf.select(col("doc_id"), col("text")), s"$want/postings")
      MinhashIndex.build(spark,
        sdf.select(col("doc_id"), col("text")), s"$want/minhash")
      LangProfileStore.buildFrom(spark, sdf, s"$want/lang")
      DsirStore.buildFrom(spark, sdf, s"$want/dsir")
      val surfaces = Seq("postings/postings", "postings/doclen",
        "postings/vocab", "postings/stats", "minhash/shingles",
        "minhash/bands", "lang/counts", "lang/profiles", "dsir/stats")
      surfaces.foreach { p =>
        assert(rels(dir, Seq(p)) == rels(want, Seq(p)),
          s"case $k surface $p victims=${victims.map(_._1)}")
      }
      val corpusLeft = spark.read.parquet(s"$dir/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(corpusLeft == survivors.map(_._1).toSet, s"case $k corpus")
    }
  }
}
