package graft

import org.apache.spark.sql.Row

import graft.pipeline.{DataOps, EventOps}

/** [[graft.pipeline.EventOps]] checked against naive single-threaded
  * reference implementations over the same sf0.001 events — the window
  * plans must equal a per-user sort + linear scan exactly. */
class EventOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** (event_id, tsNanos, user_id, event_type, value) sorted per user —
    * read through the normalized loader so the fixture survives physical
    * timestamp-encoding changes (`ts` is always epoch-ns BIGINT). */
  private lazy val byUser: Map[Long, Seq[(Long, Long, String, Double)]] = {
    graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(2),
        (r.getLong(0), r.getLong(1), r.getString(3), r.getDouble(4))))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).sortBy(e => (e._2, e._1)).toSeq)
      .toMap
  }

  test("asofAttribution equals the naive per-user linear scan") {
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      // µs-truncated time (the cross-engine grain); at equal µs the
      // click with the larger event_id must win, and an equal-µs click
      // DOES match its purchase — replay the engine's
      // (tus, kind, event_id) order.
      val ordered = evs
        .filter(e => e._3 == "click" || e._3 == "purchase")
        .sortBy(e => (e._2 / 1000L, if (e._3 == "click") 0 else 1, e._1))
      var lastClick: Option[(Long, Long)] = None // (event_id, tus)
      ordered.flatMap { case (id, ts, typ, _) =>
        val tus = ts / 1000L
        if (typ == "click") { lastClick = Some((id, tus)); None }
        else Some((id, uid,
          lastClick.map(_._1).getOrElse(-1L),
          lastClick.map(c => (tus - c._2) / 1000000L).getOrElse(-1L)))
      }
    }.sortBy(_._1)
    val got = EventOps.asofAttribution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.exists(_._3 >= 0) && got.exists(_._3 == -1L),
      "fixture must exercise both matched and unmatched purchases")
  }

  test("sessionize equals the naive gap scan and covers every event") {
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      var sess = 0L
      var prev = Long.MinValue
      // gaps on µs-truncated time — the engine's cross-engine grain
      val tagged = evs.map { case (_, ts, _, v) =>
        val tus = ts / 1000L
        if (prev == Long.MinValue || tus - prev > EventOps.SessionGapUs)
          sess += 1
        prev = tus
        (sess, tus, math.round(v * 1000000.0))
      }
      tagged.groupBy(_._1).map { case (s, rows) =>
        val tus = rows.map(_._2)
        (uid, s, tus.min / 1000000L, (tus.max - tus.min) / 1000000L,
          rows.size.toLong, rows.map(_._3).sum)
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(r => (r._1, r._2))
    assert(got == want)
    assert(got.map(_._5).sum == byUser.values.map(_.size.toLong).sum,
      "sessions must partition the event set")
    assert(got.exists(_._5 > 1), "fixture must contain multi-event sessions")
  }

  test("latestEventState equals the naive per-user argmax") {
    val rows = EventOps.latestEventState(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(rows.size == byUser.size)
    rows.foreach { case (uid, tus, eid, typ, v, n) =>
      val evs = byUser(uid)
      // (µs, event_id) argmax — µs is the finest cross-engine order
      val last = evs.maxBy(e => (e._2 / 1000L, e._1))
      assert(tus == last._2 / 1000L && eid == last._1 && typ == last._3)
      assert(v == math.round(last._4 * 1000000.0))
      assert(n == evs.size.toLong)
    }
  }

  test("jsonPropsStats extracts every k and sums exactly") {
    val rows = EventOps.jsonPropsStats(spark, sfDir).collect()
    val total = byUser.values.map(_.size.toLong).sum
    assert(rows.map(_.getLong(1)).sum == total)
    // props is always {"k": <int>} in the fixture — extraction must
    // never miss
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1), r.toString))
  }

  test("bucketed range join equals the naive interval join") {
    val got = EventOps.rangeJoinRecentErrors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    // naive reference: direct per-purchase probe over the user's errors,
    // on µs-truncated time (the cross-engine grain)
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      val errs = evs.filter(_._3 == "error").map(_._2 / 1000L)
      evs.filter(_._3 == "purchase").flatMap { case (id, ts, _, _) =>
        val tus = ts / 1000L
        val recent = errs.filter(e =>
          tus >= e && tus - e <= EventOps.LookbackUs)
        if (recent.isEmpty) None
        else Some((id, uid, recent.size.toLong,
          recent.map(e => (tus - e) / 1000000L).min))
      }
    }.sorted
    assert(got == want)
    assert(got.nonEmpty, "fixture must contain purchases with recent errors")
    val allPurch = byUser.values.flatten.count(_._3 == "purchase")
    assert(got.size < allPurch,
      "some purchases must have no recent errors")
  }

  test("funnelSteps equals the naive ordered-step scan") {
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      val f = evs.filter(e =>
        e._3 == "view" || e._3 == "click" || e._3 == "purchase")
      if (f.isEmpty) None
      else {
        val v = f.filter(_._3 == "view").map(_._2 / 1000L)
          .minOption
        val c = v.flatMap(vt => f.filter(e => e._3 == "click" &&
          e._2 / 1000L >= vt).map(_._2 / 1000L).minOption)
        val p = c.flatMap(ct => f.filter(e => e._3 == "purchase" &&
          e._2 / 1000L >= ct).map(_._2 / 1000L).minOption)
        val depth = if (p.isDefined) 3L else if (c.isDefined) 2L
          else if (v.isDefined) 1L else 0L
        Some((uid, v.getOrElse(-1L), c.getOrElse(-1L), p.getOrElse(-1L),
          depth))
      }
    }.sortBy(_._1)
    val got = EventOps.funnelSteps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == want)
    // full-depth conversions exist (the fixture is dense — at sf0.001
    // every user converts; partial depths are covered by the model
    // equality above, which includes the -1 sentinel branches), and the
    // step order invariant holds on every full-depth row
    assert(got.exists(_._5 == 3), got.map(_._5).distinct.mkString(","))
    got.filter(_._5 == 3).foreach { case (_, v, c, p, _) =>
      assert(v <= c && c <= p)
    }
  }

  test("conversionLatency equals the naive rank-picked quantiles") {
    // replay the funnel model, keep full conversions, rank-pick
    val lats = byUser.toSeq.flatMap { case (_, evs) =>
      val f = evs.filter(e =>
        e._3 == "view" || e._3 == "click" || e._3 == "purchase")
      val v = f.filter(_._3 == "view").map(_._2 / 1000L).minOption
      val c = v.flatMap(vt => f.filter(e => e._3 == "click" &&
        e._2 / 1000L >= vt).map(_._2 / 1000L).minOption)
      val p = c.flatMap(ct => f.filter(e => e._3 == "purchase" &&
        e._2 / 1000L >= ct).map(_._2 / 1000L).minOption)
      for (vt <- v; pt <- p) yield (pt - vt) / 1000000L
    }.sorted
    val n = lats.size.toLong
    def at(rank: Long): Long = lats((rank - 1).toInt)
    val r = EventOps.conversionLatency(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == at((n + 1) / 2))
    assert(r.getLong(2) == at((9 * n + 9) / 10))
    assert(r.getLong(3) == at((99 * n + 99) / 100))
    assert(r.getLong(4) == lats.max)
    assert(lats.nonEmpty && r.getLong(1) <= r.getLong(2) &&
      r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
  }

  test("userCadence equals the naive per-user gap scan") {
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      val tus = evs.sortBy(e => (e._2 / 1000L, e._1)).map(_._2 / 1000L)
      val gaps = tus.zip(tus.tail).map { case (a, b) => b - a }
      if (gaps.isEmpty) None
      else Some((uid, evs.size.toLong,
        gaps.sum / gaps.size / 1000000L,
        gaps.max / 1000000L,
        if (gaps.max * gaps.size > 4L * gaps.sum) 1L else 0L))
    }.sortBy(_._1)
    val got = EventOps.userCadence(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.exists(_._5 == 1L) && got.exists(_._5 == 0L))
  }

  test("retentionCohorts equals the naive cohort × active-day count") {
    val dayUs = EventOps.DayUs
    val want = byUser.toSeq.flatMap { case (uid, evs) =>
      evs.filter(_._3 == "signup").map(_._2 / 1000L / dayUs).minOption
        .toSeq.flatMap { cohort =>
          evs.map(_._2 / 1000L / dayUs).filter(_ >= cohort).distinct
            .map(d => ((cohort, d - cohort), uid))
        }
    }.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = EventOps.retentionCohorts(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want)
    // day-0 rows exist (signup day itself is active) and offsets spread
    assert(got.keys.exists(_._2 == 0L) && got.keys.exists(_._2 > 0L))
  }

  test("activityGapfill is dense over the hour range and preserves totals") {
    val hourUs = EventOps.HourUs
    val all = byUser.values.flatten.toSeq
    val hourly = all.groupBy(e => (e._3, e._2 / 1000L / hourUs))
      .view.mapValues(_.size.toLong).toMap
    val hours = all.map(_._2 / 1000L / hourUs)
    val (h0, h1) = (hours.min, hours.max)
    val types = all.map(_._3).distinct
    val got = EventOps.activityGapfill(spark, sfDir).collect()
      .map(r => ((r.getString(1), r.getLong(0) / 3600L), r.getLong(2)))
      .toMap
    assert(got.size == types.size * (h1 - h0 + 1).toInt,
      s"grid ${got.size} vs ${types.size} × ${h1 - h0 + 1}")
    hourly.foreach { case (k, n) => assert(got(k) == n, k.toString) }
    assert(got.values.sum == all.size.toLong)
    assert(got.values.exists(_ == 0L), "gap-fill must emit zero rows")
  }

  test("eventHistoryScd2 chains validity intervals per user") {
    val got = EventOps.eventHistoryScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == byUser.values.map(_.size).sum)
    got.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      // intervals chain: each valid_to = next valid_from; exactly one
      // current row per user, and it is the (tus, event_id) max
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._5 == b._4 && a._6 == 0L, s"user $uid")
      }
      assert(ordered.last._5 == -1L && ordered.last._6 == 1L)
      val want = byUser(uid).maxBy(e => (e._2 / 1000L, e._1))
      assert(ordered.last._2 == want._1)
    }
  }

  test("stateAsOfMidmonth equals the SCD2 interval read at T") {
    val T = EventOps.MidmonthTus
    // the as-of read the SCD2 table defines: the row whose validity
    // interval contains T
    val viaScd2 = EventOps.eventHistoryScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .filter { case (_, _, _, from, to) =>
        from <= T && (to == -1L || to > T) }
      .map { case (uid, eid, typ, from, _) => (uid, from, eid, typ) }
      .toSeq.sortBy(_._1)
    val got = EventOps.stateAsOfMidmonth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    assert(got == viaScd2)
    // T is mid-span: some users' state is NOT their final state
    val finalState = EventOps.latestEventState(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.exists { case (uid, _, eid, _) => finalState(uid) != eid })
    // count column: events at-or-before T only
    val counts = EventOps.stateAsOfMidmonth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    counts.foreach { case (uid, n) =>
      assert(n == byUser(uid).count(_._2 / 1000L <= T))
    }
  }

  test("anomalousHours equals the naive integer 3-sigma scan") {
    val hourUs = EventOps.HourUs
    val all = byUser.values.flatten.toSeq
    val hourly = all.groupBy(e => (e._3, e._2 / 1000L / hourUs))
      .view.mapValues(_.size.toLong).toMap
    val hours = all.map(_._2 / 1000L / hourUs)
    val (h0, h1) = (hours.min, hours.max)
    val want = all.map(_._3).distinct.flatMap { typ =>
      val dense = (h0 to h1).map(h => h -> hourly.getOrElse((typ, h), 0L))
      dense.zipWithIndex.collect { case ((h, x), i) if i >= 24 =>
        val trail = dense.slice(i - 24, i).map(_._2)
        val n = 24L
        val s = trail.sum
        val ssq = trail.map(c => BigInt(c) * c).sum
        val lhs = BigInt(n * x - s) * BigInt(n * x - s)
        val rhs = 9 * (n * ssq - BigInt(s) * s)
        ((h * 3600L, typ),
          (x, s * 1000000L / n, if (lhs > rhs) 1L else 0L))
      }
    }.toMap
    val got = EventOps.anomalousHours(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 == 1L), "fixture must contain anomalies")
    assert(got.values.exists(_._3 == 0L))
  }

  test("bloom tier is a sound prefilter of exact decontamination") {
    val b = DataOps.bloomDecontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bloom-positive grams are a superset of exact-contaminated grams
    b.foreach { case (doc, bg, eg, fp) =>
      assert(bg >= eg, s"doc $doc: bloom $bg < exact $eg")
      assert(fp == (if (eg == 0) 1L else 0L))
    }
    // exact tier ≡ the reference decontaminate operator's flagged docs
    val exactDocs = b.filter(_._3 > 0).map(_._1).toSet
    val want = DataOps.decontaminate(spark, sfDir).collect()
      .collect { case r: Row if r.getLong(2) == 1L => r.getLong(0) }.toSet
    assert(exactDocs == want)
  }

  test("retentionDecision is the exact conjunction of its stage gates") {
    val rows = DataOps.retentionDecision(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.foreach { case (doc, l, q, rp, d, c, k) =>
      assert(k == l * q * rp * d * c, s"doc $doc")
    }
    // every gate must actually drop someone (no vacuous stage)
    assert(rows.exists(_._2 == 0) && rows.exists(_._3 == 0) &&
      rows.exists(_._4 == 0) && rows.exists(_._5 == 0) &&
      rows.exists(_._6 == 0))
    // benchmark docs are always dropped via contam_keep
    rows.filter(_._1 % 97 == 0).foreach(r => assert(r._6 == 0L))
    assert(rows.exists(_._7 == 1) && rows.exists(_._7 == 0))
  }

  test("CorpusSink publishes kept docs partitioned by language") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curated").toString
    val written =
      graft.sources.CorpusSink.writeCurated(spark, sfDir, dir)
    val back = spark.read.parquet(dir)
    // round-trip parity with the retention verdict
    val keptIds = DataOps.retentionDecision(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("keep") === 1L)
      .collect().map(_.getLong(0)).toSet
    assert(back.count() == keptIds.size && written.count() == keptIds.size)
    assert(back.collect().map(_.getAs[Long]("doc_id")).toSet == keptIds)
    // physical layout is lang-partitioned directories, prunable on read
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(langDirs.length >= 4, langDirs.mkString(","))
    val en = spark.read.parquet(dir)
      .where(org.apache.spark.sql.functions.col("lang") === "en")
    val pruned = en.queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters"), pruned.take(400))
  }

  test("stratifiedSample keeps disjoint per-language buckets at the rate") {
    val rows = DataOps.stratifiedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rates = DataOps.StratRates.toMap
    rows.foreach { case (doc, lang, bucket) =>
      assert(bucket < rates(lang), s"doc $doc $lang bucket $bucket")
    }
    // every stratum is represented and roughly at its rate (hash spread)
    val byLang = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(rates.keySet == byLang.keySet)
  }

  test("eventPagerank replays the exact truncating power iteration") {
    import spark.implicits._
    val trans = EventOps.eventTransitions(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    val nodes = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    var r = nodes.map(_ -> (1000000L / n)).toMap
    for (_ <- 1 to EventOps.PagerankIters) {
      val contrib = nodes.map { v =>
        v -> trans.filter(_._2 == v)
          .map { case (u, _, _, p) => r(u) * p / 1000000L }.sum
      }.toMap
      r = nodes
        .map(v => v -> (150000L / n + 85L * contrib(v) / 100L)).toMap
    }
    val got = EventOps.eventPagerank(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(got == r)
    // damped mass stays near 10^6 (truncation leaks deterministically)
    assert(got.values.sum > 900000L && got.values.sum <= 1000000L)
  }

  test("eventTransitions equals the naive per-user bigram count") {
    val got = EventOps.eventTransitions(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // naive: per user, sort by (us, event_id), count consecutive pairs
    val naive = byUser.toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2 / 1000, e._1))
      ordered.zip(ordered.tail).map { case (a, b) => (a._3, b._3) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == naive.keySet)
    val fromTotals = naive.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    got.foreach { case (pair, (cnt, ppm)) =>
      assert(cnt == naive(pair))
      assert(ppm == cnt * 1000000L / fromTotals(pair._1))
    }
    // probabilities leaving each state sum to ~1 (truncation slack only)
    got.groupBy(_._1._1).foreach { case (from, rs) =>
      val s = rs.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - rs.size)
    }
  }

  test("topPaths equals the naive first-3 path count") {
    val got = EventOps.topPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.size <= 20 && got.nonEmpty)
    val naivePaths = byUser.toSeq.map { case (_, evs) =>
      evs.sortBy(e => (e._2 / 1000, e._1)).take(3).map(_._3)
        .mkString(">")
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got == naivePaths)
  }

  test("seasonalProfile equals the naive dense-grid replay") {
    val got = EventOps.seasonalProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // naive: dense per-type hourly counts over the global hour range
    val all = byUser.values.flatten.toSeq
    val hours = all.map(e => e._2 / 1000 / 3600000000L)
    val (h0, h1) = (hours.min, hours.max)
    val obs = all.groupBy(e => (e._3, e._2 / 1000 / 3600000000L))
      .view.mapValues(_.size.toLong).toMap
    val types = all.map(_._3).distinct
    val cells = (for { t <- types; h <- h0 to h1 } yield
      ((t, (h / 24 + 3) % 7, h % 24), obs.getOrElse((t, h), 0L)))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(got.keySet == cells.keySet)
    val totals = cells.toSeq.groupBy(_._1._1).view.mapValues { cs =>
      (cs.map(_._2._1).sum, cs.map(_._2._2).sum)
    }.toMap
    cells.foreach { case (k, (nh, cs)) =>
      val (th, tsum) = totals(k._1)
      val want = (nh, cs, cs * 1000000L / nh,
        if (tsum == 0) 0L
        else (BigInt(cs) * th * 1000000L / (BigInt(nh) * tsum)).toLong)
      assert(got(k) == want, s"cell $k")
    }
  }

  test("valueOutliers equals the naive integer 3-sigma value scan") {
    val byType = byUser.values.flatten.toSeq.groupBy(_._3)
      .view.mapValues(_.map(e => math.round(e._4 * 1000000.0))).toMap
    val want = byType.map { case (t, vs) =>
      val n = vs.size.toLong
      val s = vs.sum
      val ssq = vs.map(v => BigInt(v) * v).sum
      val out = vs.count { v =>
        val lhs = (BigInt(n) * v - s) * (BigInt(n) * v - s)
        lhs > 9 * (BigInt(n) * ssq - BigInt(s) * s)
      }.toLong
      t -> (n, s / n, out, out * 1000000L / n)
    }
    val got = EventOps.valueOutliers(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0L), "fixture must contain outliers")
    assert(got.values.forall(v => v._3 < v._1), "outliers must be rare")
  }

  test("eventSkewProfile equals the naive per-user count audit") {
    val counts = byUser.view.mapValues(_.size.toLong).toMap
    val vs = counts.values.toSeq.sorted
    val n = vs.size.toLong
    val total = vs.sum
    def at(num: Long, den: Long): Long = vs(((num * n + num) / den - 1).toInt)
    val top10 = vs.reverse.take(10).sum
    val r = EventOps.eventSkewProfile(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == total)
    assert(r.getLong(2) == vs.max)
    assert(r.getLong(3) == vs(((n + 1) / 2 - 1).toInt))
    assert(r.getLong(4) == vs(((9 * n + 9) / 10 - 1).toInt))
    assert(r.getLong(5) == vs(((99 * n + 99) / 100 - 1).toInt))
    assert(r.getLong(6) == vs.max * 1000000L / total)
    assert(r.getLong(7) == top10 * 1000000L / total)
    assert(r.getLong(6) > 0L && r.getLong(7) >= r.getLong(6))
  }

  test("userLtv equals the naive cohort-revenue replay") {
    val dayUs = EventOps.DayUs
    val cohorts = byUser.toSeq.flatMap { case (uid, evs) =>
      evs.filter(_._3 == "signup").map(_._2 / 1000L / dayUs).minOption
        .map(uid -> _)
    }.toMap
    val d1 = byUser.values.flatten.map(_._2 / 1000L / dayUs).max
    val rev = byUser.toSeq.flatMap { case (uid, evs) =>
      cohorts.get(uid).toSeq.flatMap { c =>
        evs.filter(e => e._3 == "purchase" && e._2 / 1000L / dayUs >= c)
          .map(e => ((c, e._2 / 1000L / dayUs - c),
            math.round(e._4 * 1000000.0)))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sizes = cohorts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val want = sizes.toSeq.flatMap { case (c, n) =>
      var cum = 0L
      (0L to (d1 - c)).map { a =>
        cum += rev.getOrElse((c, a), 0L)
        (c * 86400L, a, n, cum, cum / n)
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.userLtv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(r => (r._1, r._2))
    assert(got == want)
    // curves are monotone and the grid is dense per cohort
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byAge = rows.sortBy(_._2)
      assert(byAge.map(_._2) == (0L until byAge.size.toLong))
      assert(byAge.zip(byAge.tail).forall { case (a, b) => a._4 <= b._4 })
    }
    assert(got.exists(_._4 > 0L), "fixture must contain cohort revenue")
  }

  test("sessionSummary equals the naive session-replay statistics") {
    // replay the gap model (as in the sessionize test) then summarize
    val sessions = byUser.toSeq.flatMap { case (_, evs) =>
      var sess = 0L
      var prev = Long.MinValue
      val tagged = evs.map { case (_, ts, _, v) =>
        val tus = ts / 1000L
        if (prev == Long.MinValue || tus - prev > EventOps.SessionGapUs)
          sess += 1
        prev = tus
        (sess, tus, math.round(v * 1000000.0))
      }
      tagged.groupBy(_._1).map { case (_, rows) =>
        val tus = rows.map(_._2)
        ((tus.max - tus.min) / 1000000L, rows.size.toLong,
          rows.map(_._3).sum)
      }
    }
    val n = sessions.size.toLong
    def pick(vs: Seq[Long], num: Long, den: Long): Long = {
      val s = vs.sorted
      s(((num * n + num) / den - 1).toInt)
    }
    val r = EventOps.sessionSummary(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sessions.count(_._2 == 1L) * 1000000L / n)
    val evCnt = sessions.map(_._2)
    val durs = sessions.map(_._1)
    assert(r.getLong(2) == evCnt.sorted.apply(((n + 1) / 2 - 1).toInt))
    assert(r.getLong(3) == evCnt.sorted.apply(((9 * n + 9) / 10 - 1).toInt))
    assert(r.getLong(4) == durs.sorted.apply(((n + 1) / 2 - 1).toInt))
    assert(r.getLong(5) == durs.sorted.apply(((9 * n + 9) / 10 - 1).toInt))
    assert(r.getLong(6) == sessions.map(_._3).sum / n)
    assert(r.getLong(1) > 0L, "fixture must contain bounce sessions")
  }

  test("dauStickiness equals the naive rolling-distinct replay") {
    val dayUs = EventOps.DayUs
    val pairs = byUser.toSeq.flatMap { case (uid, evs) =>
      evs.map(e => (e._2 / 1000L / dayUs, uid))
    }.distinct
    val (d0, d1) = (pairs.map(_._1).min, pairs.map(_._1).max)
    def actives(day: Long, span: Long): Long =
      pairs.filter(p => p._1 <= day && p._1 > day - span)
        .map(_._2).distinct.size.toLong
    val want = pairs.map(_._1).distinct.sorted.map { day =>
      val (dau, wau, mau) = (actives(day, 1), actives(day, 7),
        actives(day, 30))
      (day * 86400L, dau, wau, mau, dau * 1000000L / mau)
    }
    val got = EventOps.dauStickiness(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.forall(r => r._2 <= r._3 && r._3 <= r._4),
      "DAU <= WAU <= MAU must hold everywhere")
    assert(got.exists(r => r._2 < r._4), "windows must differ somewhere")
    assert(d0 < d1)
  }

  test("rfmScores equals the naive value-quintile replay") {
    val anchor = byUser.values.flatten.map(_._2 / 1000L).max
    val base = byUser.toSeq.flatMap { case (uid, evs) =>
      val p = evs.filter(_._3 == "purchase")
      if (p.isEmpty) None
      else Some((uid,
        (anchor - p.map(_._2 / 1000L).max) / EventOps.DayUs,
        p.size.toLong,
        p.map(e => math.round(e._4 * 1000000.0)).sum))
    }
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted
      val n = s.size
      (1 to 4).map(i => s((i * n + 4) / 5 - 1))
    }
    def score(v: Long, c: Seq[Long]): Long = 1L + c.count(v > _)
    val rc = cuts(base.map(b => -b._2))
    val fc = cuts(base.map(_._3))
    val mc = cuts(base.map(_._4 / 1000000L))
    val want = base.map { case (uid, r, f, m) =>
      val (rs, fs, ms) =
        (score(-r, rc), score(f, fc), score(m / 1000000L, mc))
      (uid, r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.sortBy(_._1)
    val got = EventOps.rfmScores(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq.sortBy(_._1)
    assert(got == want)
    // value ties score identically (the non-ntile property)
    got.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._6).distinct.size == 1, "equal f_cnt, equal score")
    }
    assert(got.map(_._5).distinct.size >= 3 &&
      got.forall(r => r._5 >= 1 && r._5 <= 5))
  }

  test("abTestMetrics equals the naive hash-split replay") {
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val want = byUser.toSeq.map { case (uid, evs) =>
      val p = evs.filter(_._3 == "purchase")
      (h60(s"ab:$uid") % 2, uid, p.size.toLong,
        p.map(e => math.round(e._4 * 1000000.0)).sum)
    }.groupBy(_._1).map { case (arm, us) =>
      val n = us.size.toLong
      val buyers = us.count(_._3 > 0).toLong
      val rev = us.map(_._4).sum
      (arm, n, buyers, buyers * 1000000L / n,
        us.map(_._3).sum, rev, rev / n)
    }.toSeq.sortBy(_._1)
    val got = EventOps.abTestMetrics(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.map(_._1) == Seq(0L, 1L), "both arms populated")
  }

  test("columnProfile equals the naive per-column scan") {
    val got = EventOps.columnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6), r.getString(7), r.getLong(8)))
      .toMap
    assert(got.keySet == Set("event_id", "ts", "user_id", "event_type",
      "value", "props"))
    val all = byUser.values.flatten.toSeq
    val n = all.size.toLong
    got.values.foreach(v => assert(v._1 == n))
    // event_id: all distinct, contiguous ids
    val ids = all.map(_._1)
    assert(got("event_id") == (n, 0L, n, ids.min, ids.max,
      "", "", ids.map(_.toString.length.toLong).sum))
    // value: micro-rounded BIGINT tier
    val micros = all.map(e => math.round(e._4 * 1000000.0))
    assert(got("value")._4 == micros.min && got("value")._5 == micros.max)
    assert(got("value")._3 == micros.distinct.size.toLong)
    // event_type: string tier with numeric sentinel
    val types = all.map(_._3)
    assert(got("event_type") == (n, 0L, types.distinct.size.toLong, -1L,
      -1L, types.min, types.max, types.map(_.length.toLong).sum))
  }

  test("burstiness equals the naive Fano fold over gap-filled hours") {
    import spark.implicits._
    val got = graft.pipeline.EventOps.burstiness(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000 / 3600000000L))
    val h0 = evs.map(_._2).min
    val h1 = evs.map(_._2).max
    val expect = evs.groupBy(_._1).map { case (t, rs) =>
      val byH = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cnts = (h0 to h1).map(h => byH.getOrElse(h, 0L))
      val n = BigInt(cnts.size)
      val s = BigInt(cnts.sum)
      val ssq = cnts.map(c => BigInt(c) * c).sum
      val fano = ((n * ssq - s * s) * 1000000 / (n * s)).toLong
      t -> (cnts.size.toLong, (s * 1000 / n).toLong, fano,
        if (fano > graft.pipeline.EventOps.FanoPpmMax) 1L else 0L)
    }
    assert(got == expect)
    // dispersion must vary across types on the fixture
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("cusumDrift equals the naive sequential CUSUM recurrence") {
    import spark.implicits._
    val got = graft.pipeline.EventOps.cusumDrift(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000 / 3600000000L))
    val h0 = evs.map(_._2).min
    val h1 = evs.map(_._2).max
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val byH = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cnts = (h0 to h1).map(h => h -> byH.getOrElse(h, 0L))
      val n = h1 - h0 + 1
      val mu = cnts.map(_._2).sum / n
      val k = mu / 4
      var sp = 0L
      var sn = 0L
      cnts.map { case (h, c) =>
        sp = math.max(0L, sp + c - mu - k)
        sn = math.max(0L, sn + (mu - k) - c)
        (t, h * 3600L, c, sp, sn, if (sp > 2 * mu || sn > 2 * mu) 1L else 0L)
      }
    }.toSet
    assert(got == expect)
    // a real detector: the upward state must rise somewhere and sit at
    // zero somewhere (the max-clamp reset); the DOWNWARD side cannot
    // rise at sf0.001 — the truncating hourly mean is 0 there, which
    // the exact-match against the naive fold above already pins
    assert(got.exists(_._4 > 0L))
    assert(got.exists(_._4 == 0L))
  }

  test("madOutliers equals the naive median/MAD fold") {
    import spark.implicits._
    val got = EventOps.madOutliers(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_id", "event_type",
        "CAST(ROUND(value * 1000000.0) AS LONG) AS v")
      .as[(Long, String, Long)].collect().toSeq
    // ceil-rank pick: minimal element whose cumulative count ≥ (n+1)/2
    def ceilMed(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val expect = evs.groupBy(_._2).toSeq.flatMap { case (t, rs) =>
      val med = ceilMed(rs.map(_._3))
      val mad = ceilMed(rs.map(r => math.abs(r._3 - med)))
      rs.map(r => (r._1, t, r._3, med, mad,
        if (math.abs(r._3 - med) * 10000L > mad * 44478L) 1L else 0L))
    }.toSet
    assert(got == expect)
    // both verdicts fire on the fixture
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L))
  }

  test("concurrentSessions equals the naive sweep-line fold") {
    import spark.implicits._
    val got = EventOps.concurrentSessions(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // naive sessions per user (µs grain, >30 min gap splits)
    val ivals = byUser.toSeq.flatMap { case (_, evs) =>
      val tus = evs.map(_._2 / 1000)
      val iv = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var s = tus.head
      var last = tus.head
      tus.tail.foreach { t =>
        if (t - last > EventOps.SessionGapUs) { iv += ((s, last)); s = t }
        last = t
      }
      iv += ((s, last))
      iv.toSeq
    }
    val deltas = ivals.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
      .sortBy(identity)
    var run = 0L
    val runs = deltas.map { case (t, d) =>
      run += d; (t / EventOps.HourUs, d, run)
    }
    val hr = runs.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).max, g.map(_._2).sum)).toMap
    val (h0, h1) = (hr.keys.min, hr.keys.max)
    var carry = 0L
    val expect = (h0 to h1).map { h =>
      val (hmax, net) = hr.getOrElse(h, (carry, 0L))
      val row = (h * 3600L, math.max(hmax, carry), carry + net)
      carry += net
      row
    }
    assert(got == expect)
    assert(got.last._3 == 0L, "every session must close by the last hour")
    assert(got.map(_._2).max >= 2L, "fixture sessions must overlap")
  }

  test("eventAutocorr equals the naive Durbin-Watson fold") {
    import spark.implicits._
    val got = EventOps.eventAutocorr(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000 / EventOps.HourUs))
    val (h0, h1) = (evs.map(_._2).min, evs.map(_._2).max)
    val expect = evs.groupBy(_._1).toSeq.map { case (t, rs) =>
      val byH = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val xs = (h0 to h1).map(h => byH.getOrElse(h, 0L))
      val n = xs.size.toLong
      val s = BigInt(xs.sum)
      val sq = xs.map(x => BigInt(x) * x).sum
      val sd = xs.sliding(2).map { case Seq(a, b) => BigInt(b - a).pow(2) }
        .sum
      val dw = (BigInt(1000000) * n * sd / (n * sq - s * s)).toLong
      (t, n, dw, if (dw < 1500000L) 1L else 0L)
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("ewmaSmooth equals the naive per-type EWMA recurrence") {
    import spark.implicits._
    val got = EventOps.ewmaSmooth(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000 / EventOps.HourUs))
    val (h0, h1) = (evs.map(_._2).min, evs.map(_._2).max)
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val byH = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var sm = -1L
      (h0 to h1).map { h =>
        val c = byH.getOrElse(h, 0L)
        sm = if (sm < 0) c * 1000000L else (3 * sm + c * 1000000L) / 4
        (t, h * 3600L, c, sm)
      }
    }.toSet
    assert(got == expect)
    // the level genuinely smooths: it lags the raw count somewhere
    assert(got.exists(r => r._4 != r._3 * 1000000L))
  }

  test("valueDrift equals the naive exact total-variation fold") {
    import spark.implicits._
    val got = graft.pipeline.EventOps.valueDrift(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000,
        math.round(r.getDouble(2) * 1000000.0)))
    def fl(a: Long, b: Long) = math.floorDiv(a, b)
    val expect = evs.groupBy(_._1).map { case (t, rs) =>
      val halves = rs.map(r =>
        (if (r._2 > graft.pipeline.EventOps.MidmonthTus) 1 else 0,
          fl(r._3, 500000L)))
      val c1 = halves.filter(_._1 == 0).groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val c2 = halves.filter(_._1 == 1).groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val (n1, n2) = (c1.values.sum, c2.values.sum)
      val l1 = (c1.keySet ++ c2.keySet).toSeq.map(b =>
        BigInt(c1.getOrElse(b, 0L)) * n2 -
          BigInt(c2.getOrElse(b, 0L)) * n1).map(_.abs).sum
      val tv = (l1 * 500000 / (BigInt(n1) * n2)).toLong
      t -> (n1, n2, tv,
        if (tv > graft.pipeline.EventOps.DriftTvPpmMax) 1L else 0L)
    }
    assert(got == expect)
    // TV is a proper distance: within [0, 1e6], positive somewhere
    // (sampling noise between halves), and not uniform across types
    assert(got.values.forall(v => v._3 >= 0L && v._3 <= 1000000L))
    assert(got.values.exists(_._3 > 0L))
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("winsorize clamps to the naive ceil-rank [p5, p95] band") {
    import spark.implicits._
    val got = graft.pipeline.EventOps.winsorize(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val evs = graft.pipeline.RelOps.events(spark, sfDir)
      .selectExpr("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 1000000.0)))
    assert(got.size == evs.length)
    val th = evs.groupBy(_._2).view.mapValues { rs =>
      val vs = rs.map(_._3).sorted
      val n = vs.length.toLong
      def pick(rank: Long) = vs((rank - 1).toInt)
      (pick((n + 19) / 20), pick((19 * n + 19) / 20))
    }.toMap
    val expect = evs.map { case (id, t, v) =>
      val (lo, hi) = th(t)
      (id, t, v, math.max(lo, math.min(hi, v)))
    }.map(e => (e._1, e._2) -> (e._3, e._4)).toMap
    got.foreach { case (id, t, v, w, c) =>
      assert(expect((id, t)) == (v, w), s"event $id")
      assert(c == (if (v != w) 1L else 0L), s"event $id clipped")
    }
    // both tails must actually clip on the fixture
    assert(got.exists(r => r._5 == 1L && r._3 < r._4), "low tail")
    assert(got.exists(r => r._5 == 1L && r._3 > r._4), "high tail")
  }
}
