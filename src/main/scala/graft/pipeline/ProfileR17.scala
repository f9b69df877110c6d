package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 measurement harness (guide §1 "measure first"): isolates
  * the components of the audit queries the round-16 verdict ranked as
  * residuals — annRecallEval's five tier probes, embedDedupRecall's
  * two end-to-end tiers, dedupNgramSource's three pipeline stages —
  * and times each SERIALLY in isolation so the max tier is a measured
  * number, not a guess. Mirrors Bench's session setup and its
  * warmup-then-time protocol (trained-model caches fill during warmup
  * exactly as in a bench run, so timed numbers are probe-only like the
  * bench's). Measurement-only: registered in no registry, touches no
  * query. Usage: `sbt "runMain graft.pipeline.ProfileR17 [section]"`.
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val section = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label%-42s $sec%8.3f s")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (section == "all" || section == "ann") {
      // ---- annRecallEval decomposition ----
      // Warmup identical in effect to Bench's: one full run fills the
      // cachedModel entries (annTruth, ivf centroids, pq codebook).
      time("annRecallEval warmup (full)") {
        DataOps.annRecallEval(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      (1 to 2).foreach { rnd =>
        println(s"-- ann round $rnd (timed, post-warmup)")
        val q = DataOps.annQueries(spark, sfDir)
        val v = DataOps.emb(spark, sfDir)
        val cents = DataOps.centroids(spark, sfDir)
        var ranks: DataFrame = null
        var coded: DataFrame = null
        var recon: DataFrame = null
        var refined: DataFrame = null
        time("shared: ranks (cellRanks rnk=1)") {
          ranks = DataOps.cellRanks(spark, sfDir, cents)
            .where(col("rnk") === 1)
            .select(col("vec_id"), col("cid")).persist()
          ranks.count()
        }
        time("shared: coded (pqParts codes)") {
          val (el, r, c0) = DataOps.pqParts(spark, sfDir)
          refined = r
          coded = c0.persist()
          coded.count()
        }
        time("shared: recon (sqRecon)") {
          recon = DataOps.sqRecon(spark, v).persist()
          recon.count()
        }
        time("tier ivf probe") {
          DataOps.ivfProbe(spark, q, cents, ranks, v).localCheckpoint(true)
        }
        time("tier ivfpq probe") {
          DataOps.ivfPqProbe(spark, q, cents,
            ranks.select(col("vec_id"), col("cid").as("cell")),
            refined, coded, v).localCheckpoint(true)
        }
        time("tier lsh (annLsh full)") {
          DataOps.annLsh(spark, sfDir).localCheckpoint(true)
        }
        time("tier pq probe") {
          DataOps.pqProbe(spark, q, refined, coded, v).localCheckpoint(true)
        }
        time("tier sq probe") {
          DataOps.sqProbe(spark, q, recon, v).localCheckpoint(true)
        }
        spark.catalog.clearCache()
      }
      // the registry entry itself, timed as the bench would
      (1 to 2).foreach { i =>
        time(s"annRecallEval end-to-end #$i") {
          DataOps.annRecallEval(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (section == "all" || section == "embed") {
      // ---- embedDedupRecall decomposition ----
      time("embedDedupRecall warmup (full)") {
        DataOps.embedDedupRecall(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      (1 to 2).foreach { rnd =>
        println(s"-- embed round $rnd (timed, post-warmup)")
        val v = DataOps.emb(spark, sfDir)
        val ids = v.select(col("vec_id"))
          .where(pmod(graft.functions.HashFns.hash60(
            concat(lit("erecall:"), col("vec_id"))), lit(2L)) === 0L)
        var vs: DataFrame = null
        time("shared: vs (sample vectors) warm") {
          vs = v.join(ids, Seq("vec_id"), "left_semi").persist()
          vs.count()
        }
        time("fixed tier: cellRanks+semi assign") {
          val fixedAssign = DataOps.cellRanks(spark, sfDir,
              DataOps.centroids(spark, sfDir))
            .where(col("rnk") <= 2)
            .join(ids, Seq("vec_id"), "left_semi")
            .select(col("vec_id"), col("cid")).persist()
          fixedAssign.count()
        }
        time("scaled tier: train+assign") {
          // inlined scaledCellKnobs (private): C from count, mod ~32/cell
          val n = math.max(1L, v.count())
          val c = math.max(DataOps.IvfC.toLong,
            n / DataOps.SemCellTarget).toInt
          val sampleMod = math.max(1L, n / (32L * c))
          val trainSample = v.where(
            pmod(graft.functions.HashFns.hash60(
              col("vec_id").cast("string")), lit(sampleMod)) === 0)
          val cents = DataOps.pin(
            DataOps.centroidsFrom(trainSample, c, rounds = 1))
          val scaledAssign = vs.crossJoin(broadcast(cents))
            .select(col("vec_id"), col("cid"),
              (graft.functions.VecDotExpr.dot(spark, col("em"), col("cem"))
                .cast("double") /
                (sqrt(col("nrm").cast("double")) *
                  sqrt(col("cn").cast("double")))).as("cs"))
            .groupBy(col("vec_id"))
            .agg(graft.functions.TopKAgg.topK(spark,
              struct(col("cs"), (-col("cid")).as("ncid")), 2).as("top"))
            .select(col("vec_id"), explode(col("top")).as("e"))
            .select(col("vec_id"), (-col("e.ncid")).as("cid")).persist()
          scaledAssign.count()
        }
        spark.catalog.clearCache()
      }
      (1 to 2).foreach { i =>
        time(s"embedDedupRecall end-to-end #$i") {
          DataOps.embedDedupRecall(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (section == "all" || section == "ngram") {
      // ---- dedupNgramSource stage decomposition (replicated inline
      // from ngramPairsFrom so each stage can be timed with a noop
      // sink; the query itself is untouched) ----
      time("dedupNgramSource warmup (full)") {
        DataOps.dedupNgramSource(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      (1 to 2).foreach { rnd =>
        println(s"-- ngram round $rnd (timed, post-warmup)")
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text"))
        val tok = d
          .select(col("doc_id"), col("source"),
            explode(graft.functions.WordGramsExpr.grams(spark, col("text"),
              1, distinct = true)).as("w"))
          .persist()
        time("stage: tok persist+count") { tok.count() }
        val ntok = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
        val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("f"))
        val ranked = tok.join(freq, Seq("w"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"))
              .orderBy(col("f").asc, col("w").asc)))
          .join(ntok, Seq("doc_id"))
          .where(col("r") <= col("nt") - expr("(nt * 4 + 4) div 5") + 1)
          .select(col("doc_id"), col("source"), col("w"), col("nt"),
            col("r").cast("long").as("r"))
        val pref = ranked.select(
          col("doc_id"), col("source"), col("nt"), col("r"),
          xxhash64(col("source"), col("w")).as("wh"))
        val cand = pref.as("a").join(pref.as("b"),
            col("a.wh") === col("b.wh") &&
              col("a.source") === col("b.source") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.nt") * 5 >= col("b.nt") * 4 &&
              col("b.nt") * 5 >= col("a.nt") * 4 &&
              lit(9L) * (least(col("a.nt") - col("a.r"),
                col("b.nt") - col("b.r")) + 1L) >=
                lit(4L) * (col("a.nt") + col("b.nt")))
          .select(col("a.source").as("source"),
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val candP = cand.persist()
        time("stage: prefix+cand distinct") { candP.count() }
        val docTok = tok.groupBy(col("doc_id"))
          .agg(collect_set(col("w")).as("ws"), count(lit(1)).as("nt"))
        time("stage: verify join (from warm cand)") {
          noop(candP
            .join(docTok.select(col("doc_id").as("doc_a"),
              col("ws").as("wa"), col("nt").as("na")), Seq("doc_a"))
            .join(docTok.select(col("doc_id").as("doc_b"),
              col("ws").as("wb"), col("nt").as("nb")), Seq("doc_b"))
            .withColumn("inter",
              size(array_intersect(col("wa"), col("wb"))).cast("long"))
            .select(col("source"), col("doc_a"), col("doc_b"),
              round(col("inter").cast("double") /
                (col("na") + col("nb") - col("inter")).cast("double") *
                lit(1000000L)).cast("long").as("jac_micro"))
            .where(col("jac_micro") >= 800000L))
        }
        spark.catalog.clearCache()
      }
      (1 to 2).foreach { i =>
        time(s"dedupNgramSource end-to-end #$i") {
          DataOps.dedupNgramSource(spark, sfDir).count()
        }
        spark.catalog.clearCache()
      }
    }

    if (section == "all" || section == "ngram2") {
      // ---- dedupNgramSource STRUCTURE variants: exact copies of
      // ngramPairsFrom with incremental warm/persist coordination, to
      // locate the cache-race duplication the end-to-end pays beyond
      // the warm stage sums ----
      def ngramVariant(warmTok: Boolean, persistDocTok: Boolean,
          persistCand: Boolean): DataFrame = {
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
        val tok = d
          .select(col("doc_id"), col("source"),
            explode(graft.functions.WordGramsExpr.grams(spark, col("text"),
              1, distinct = true)).as("w"))
          .persist()
        if (warmTok) tok.count()
        val ntok = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
        val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("f"))
        val ranked = tok.join(freq, Seq("w"))
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"))
              .orderBy(col("f").asc, col("w").asc)))
          .join(ntok, Seq("doc_id"))
          .where(col("r") <= col("nt") - expr("(nt * 4 + 4) div 5") + 1)
          .select(col("doc_id"), col("source"), col("w"), col("nt"),
            col("r").cast("long").as("r"))
        val pref = ranked.select(
          col("doc_id"), col("source"), col("nt"), col("r"),
          xxhash64(col("source"), col("w")).as("wh"))
        val cand0 = pref.as("a").join(pref.as("b"),
            col("a.wh") === col("b.wh") &&
              col("a.source") === col("b.source") &&
              col("a.doc_id") < col("b.doc_id") &&
              col("a.nt") * 5 >= col("b.nt") * 4 &&
              col("b.nt") * 5 >= col("a.nt") * 4 &&
              lit(9L) * (least(col("a.nt") - col("a.r"),
                col("b.nt") - col("b.r")) + 1L) >=
                lit(4L) * (col("a.nt") + col("b.nt")))
          .select(col("a.source").as("source"),
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val cand = if (persistCand) { val c = cand0.persist(); c.count(); c }
          else cand0
        val docTok0 = tok.groupBy(col("doc_id"))
          .agg(collect_set(col("w")).as("ws"), count(lit(1)).as("nt"))
        val docTok = if (persistDocTok) {
          val p = docTok0.persist(); p.count(); p
        } else docTok0
        val out = cand
          .join(docTok.select(col("doc_id").as("doc_a"),
            col("ws").as("wa"), col("nt").as("na")), Seq("doc_a"))
          .join(docTok.select(col("doc_id").as("doc_b"),
            col("ws").as("wb"), col("nt").as("nb")), Seq("doc_b"))
          .withColumn("inter",
            size(array_intersect(col("wa"), col("wb"))).cast("long"))
          .select(col("source"), col("doc_a"), col("doc_b"),
            round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")).cast("double") *
              lit(1000000L)).cast("long").as("jac_micro"))
          .where(col("jac_micro") >= 800000L)
        val pinned = out.localCheckpoint(true)
        tok.unpersist()
        if (persistDocTok) docTok.unpersist()
        if (persistCand) cand.unpersist()
        pinned
      }
      time("ngram v0 (exact copy, no warms)") {
        ngramVariant(warmTok = false, persistDocTok = false,
          persistCand = false)
      }
      spark.catalog.clearCache()
      (1 to 2).foreach { _ =>
        time("ngram v0 (exact copy, no warms)") {
          ngramVariant(warmTok = false, persistDocTok = false,
            persistCand = false)
        }
        spark.catalog.clearCache()
        time("ngram v1 (warm tok)") {
          ngramVariant(warmTok = true, persistDocTok = false,
            persistCand = false)
        }
        spark.catalog.clearCache()
        time("ngram v2 (warm tok + persist docTok)") {
          ngramVariant(warmTok = true, persistDocTok = true,
            persistCand = false)
        }
        spark.catalog.clearCache()
        time("ngram v3 (warm tok + docTok + cand)") {
          ngramVariant(warmTok = true, persistDocTok = true,
            persistCand = true)
        }
        spark.catalog.clearCache()
        time("ngram v4 (warm tok + cand only)") {
          ngramVariant(warmTok = true, persistDocTok = false,
            persistCand = true)
        }
        spark.catalog.clearCache()
        time("ngram v5 (cand only, no tok warm)") {
          ngramVariant(warmTok = false, persistDocTok = false,
            persistCand = true)
        }
        spark.catalog.clearCache()
      }
    }

    if (section == "all" || section == "retrieval") {
      // ---- rrfFusion variants ----
      time("rrfFusion warmup (current form)") {
        DataOps.rrfFusion(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      (1 to 3).foreach { _ =>
        time("rrf current (shared dt, warm, overlapped)") {
          DataOps.rrfFusion(spark, sfDir).count()
        }
        spark.catalog.clearCache()
        time("rrf pre-round (standalone rankers serial)") {
          DataOps.rrfStage(DataOps.tfidfSearch(spark, sfDir),
            DataOps.bm25Search(spark, sfDir)).count()
        }
        spark.catalog.clearCache()
        time("rrf v1 (pinned qh, no warm barrier)") {
          val dt = DataOps.docTokenCounts(spark, sfDir).persist()
          val dls = dt.groupBy(col("doc_id")).agg(sum(col("cnt")).as("dl"))
          val ndocs = DataOps.pin(
            spark.read.parquet(s"$sfDir/documents.parquet")
              .agg(count(lit(1)).as("n")))
          val sdl = dls.agg(sum(col("dl")).as("sdl"))
          val qh = DataOps.pin(DataOps.retrievalQueryHead(
            DataOps.vocabOfCounts(dt), ndocs))
          val t = DataOps.tfidfScoreStage(dt, qh).localCheckpoint(true)
          val b = DataOps.bm25ScoreStage(dt, dls, ndocs, sdl, qh)
            .localCheckpoint(true)
          val out = DataOps.rrfStage(t, b).localCheckpoint(true)
          dt.unpersist()
          out.count()
        }
        spark.catalog.clearCache()
      }
    }

    spark.stop()
  }
}
