package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.model.Model.StreamEvent
import graft.pipeline.EventOps
import graft.streaming.EventStreamOps

/** Streaming event-analytics twins (SURVEY.md §2.6 event tier): the
  * `session_window` sessionizer and the stateful as-of attribution
  * operator must equal their batch forms on the same fixture, including
  * state carried across micro-batch boundaries. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"
  private val ctr = new AtomicInteger()
  private def freshName(p: String) = s"${p}_${ctr.incrementAndGet()}"

  private lazy val fixtureEvents: Seq[StreamEvent] = {
    // normalized loader: `ts` is epoch-ns BIGINT whatever the file's
    // physical timestamp encoding
    graft.pipeline.RelOps.events(spark, SF)
      .selectExpr("event_id", "ts AS tns", "user_id", "event_type",
        "CAST(ROUND(value * 1000000.0) AS LONG) AS v")
      .as[StreamEvent].collect().toSeq.sortBy(e => (e.tns, e.event_id))
  }

  /** Far-future event that advances the watermark past every fixture
    * session; its own session never flushes. */
  private def flushEvent: StreamEvent =
    StreamEvent(-1L, fixtureEvents.map(_.tns).max + 30L * 86400L *
      1000000000L, 999999L, "view", 0L)

  test("streaming session_window equals the batch gaps-and-islands twin") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("sess")
    val q = EventStreamOps.sessionizeStream(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      in.addData(fixtureEvents)
      q.processAllAvailable()
      in.addData(flushEvent)
      q.processAllAvailable()
      val streamed = spark.table(name)
        .where(col("user_id") =!= 999999L)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val batch = EventOps.sessionize(spark, SF)
        .select("user_id", "start_sec", "n_events", "val_micro")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("range")
    val q = EventStreamOps.rangeJoinRecentErrorsStream(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      in.addData(fixtureEvents)
      q.processAllAvailable()
      // the flush rows must PASS the per-side filters to advance both
      // watermarks (the join watermark is their min); 10 days apart so
      // they never join each other, synthetic user excluded below
      val base = fixtureEvents.map(_.tns).max
      in.addData(
        StreamEvent(-1L, base + 30L * 86400L * 1000000000L, 999999L,
          "error", 0L),
        StreamEvent(-2L, base + 40L * 86400L * 1000000000L, 999999L,
          "purchase", 0L))
      q.processAllAvailable()
      val streamed = spark.table(name)
        .where(col("user_id") =!= 999999L)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val batch = EventOps.rangeJoinRecentErrors(spark, SF)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  /** TTL above the fixture's 30-day span so the batch-parity runs never
    * evict state mid-stream; the eviction test passes its own. */
  private def runAsof(batches: Seq[Seq[StreamEvent]],
      ttlMs: Long = 60L * 86400L * 1000L): Seq[(Long, Long,
      Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("asof")
    val q = EventStreamOps.asofAttributionStream(in.toDS(), ttlMs = ttlMs)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("streaming funnel compacts to the batch funnel across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("funnel")
    val q = EventStreamOps.funnelStream(in.toDS(),
        ttlMs = 60L * 86400L * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // three batches split by global event time — per-key event-time
      // order holds across the boundaries
      val sorted = fixtureEvents
      val (a, rest) = sorted.splitAt(sorted.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { batch =>
        in.addData(batch); q.processAllAvailable()
      }
      // changelog compaction: per user the depth only grows and step
      // times never change once set, so the max-depth row IS the latest
      // (order-independent — memory-sink row order is not contractual)
      val streamed = spark.table(name)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._5) }
        .toSeq.sortBy(_._1)
      val batch = EventOps.funnelSteps(spark, SF)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(streamed == batch)
      // at least one user's funnel must progress across a boundary
      // (multiple emitted rows with different depths)
      val multi = spark.table(name)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).values.filter(_.map(_._5).distinct.size > 1)
      assert(multi.nonEmpty, "no cross-batch funnel progression")
    } finally q.stop()
  }

  test("as-of click state evicts past the event-time TTL") {
    val day = 86400L * 1000000000L // ns
    // user 1 clicks at day 0 and purchases at day 1 (attributed);
    // user 2's traffic pushes the watermark past day0 + 7d TTL, firing
    // the event-time timeout; user 1's purchase at day 21 then finds no
    // state and attributes to -1 — bounded state, by design
    val got = runAsof(Seq(
      Seq(StreamEvent(10L, 0L * day + 1000000L, 1L, "click", 0L),
        StreamEvent(11L, 1L * day, 1L, "purchase", 0L)),
      Seq(StreamEvent(20L, 20L * day, 2L, "view", 0L)),
      Seq(StreamEvent(12L, 21L * day, 1L, "purchase", 0L))),
      ttlMs = 7L * 86400L * 1000L)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(11L)._3 == 10L, got.toString) // pre-TTL: attributed
    assert(byId(12L)._3 == -1L && byId(12L)._4 == -1L,
      got.toString) // post-eviction: no click state
  }

  test("dedupExactStream evicts dedup state once the watermark passes") {
    import graft.model.Model.TimedMessage
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TimedMessage]
    val name = freshName("dedupev")
    val q = graft.streaming.StreamingOps.dedupExactStream(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      in.addData(
        TimedMessage(1L, 0L, "ch", "a", "alpha"),
        TimedMessage(2L, 1L, "ch", "b", "alpha")) // in-watermark dup
      q.processAllAvailable()
      // 10 s watermark: advance event time far ahead in its own batch
      // (eviction uses the watermark as of batch START, so it lags one
      // batch), then the repeated text must SURVIVE again — bounded
      // state means horizon-scoped dedup, not global
      in.addData(TimedMessage(3L, 1000L, "ch", "c", "advance"))
      q.processAllAvailable()
      in.addData(TimedMessage(4L, 1001L, "ch", "d", "alpha"))
      q.processAllAvailable()
      val got = spark.table(name).select("seq").as[Long].collect().toSet
      assert(got.contains(1L) && !got.contains(2L), got.toString)
      assert(got.contains(4L), "evicted hash must survive again: " + got)
    } finally q.stop()
  }

  test("streaming as-of attribution equals the batch plan") {
    val batch = EventOps.asofAttribution(spark, SF)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(runAsof(Seq(fixtureEvents)) == batch)
  }

  test("as-of click state survives micro-batch boundaries") {
    val batch = EventOps.asofAttribution(spark, SF)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // split by global event time: per-user order across batches holds
    val mid = fixtureEvents(fixtureEvents.size / 2).tns
    val (a, b) = fixtureEvents.partition(_.tns <= mid)
    val streamed = runAsof(Seq(a, b))
    assert(streamed == batch)
    // the boundary actually separates attributions from their clicks
    // for at least one user (otherwise this test is vacuous)
    val usersB = b.filter(_.event_type == "purchase").map(_.user_id).toSet
    val clicksA = a.filter(_.event_type == "click").map(_.user_id).toSet
    assert((usersB & clicksA).nonEmpty)
  }

  test("A/B counter stream equals the batch aggregate at each trigger") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("ab")
    val q = EventStreamOps.abTestStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def batchOf(evs: Seq[StreamEvent]) =
        EventStreamOps.abCounterStats(evs.toDF())
          .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val (a, b) = fixtureEvents.splitAt(100)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name).as[(Long, Long, Long, Long)]
        .collect().toSeq
      assert(s1.sorted == batchOf(a), "trigger-1 counters != batch(a)")
      in.addData(b); q.processAllAvailable()
      // trigger-2 updates fold trigger-1 state: latest row per arm must
      // equal the full-prefix batch aggregate
      val all = spark.table(name).as[(Long, Long, Long, Long)]
        .collect().toSeq
      val s2 = all.diff(s1)
      assert(s2.sorted == batchOf(fixtureEvents),
        "trigger-2 counters lost carried state")
      // the assignment splits the fixture into two populated arms
      assert(s2.map(_._1).toSet == Set(0L, 1L))
    } finally q.stop()
  }

  test("A/B user registers equal the batch build and fold across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("abreg")
    val q = EventStreamOps.abUserRegisterStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def regsOf(evs: Seq[StreamEvent]) =
        graft.pipeline.RelOps.hllRegistersBy(
          EventStreamOps.abUserLong(evs.toDF()))
          .as[(String, Long, Long)].collect().toSeq
      val (a, b) = fixtureEvents.splitAt(50)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name).as[(String, Long, Long)].collect().toSeq
      assert(s1.sorted == regsOf(a).sorted)
      in.addData(b); q.processAllAvailable()
      val all = spark.table(name).as[(String, Long, Long)].collect().toSeq
      val s2 = all.diff(s1)
      val full = regsOf(fixtureEvents).map(r => (r._1, r._2) -> r._3).toMap
      assert(s2.nonEmpty)
      s2.foreach { case (k, bkt, mj) =>
        assert(mj == full((k, bkt)), s"register ($k,$bkt) lost state")
      }
      // all four key families present: users/buyers × arm 0/1
      assert(all.map(_._1).toSet ==
        Set("users:0", "users:1", "buyers:0", "buyers:1"))
    } finally q.stop()
  }

  test("streaming EWMA equals the batch recurrence on every closed hour") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val hourOf = (e: StreamEvent) => (e.tns / 1000L) / EventOps.HourUs
    val h0 = fixtureEvents.map(hourOf).min
    val name = freshName("ewma")
    val q = EventStreamOps.ewmaStream(in.toDS(), h0)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val (a, b) = fixtureEvents.splitAt(100)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name)
        .as[(String, Long, Long, Long)].collect().toSeq
      in.addData(b); q.processAllAvailable()
      val all = spark.table(name)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(all.size > s1.size, "trigger 2 must close further hours")
      // a type's level is final through its second-to-last DISTINCT
      // event hour (the open hour only folds when a later one arrives)
      val closedThrough = fixtureEvents.groupBy(_.event_type).view
        .mapValues { evs =>
          val hs = evs.map(hourOf).distinct.sorted
          if (hs.size >= 2) hs(hs.size - 2) else h0 - 1
        }.toMap
      val batch = EventOps.ewmaSmooth(spark, SF)
        .as[(String, Long, Long, Long)].collect().toSeq
        .filter { case (t, hs, _, _) => hs / 3600L <= closedThrough(t) }
      assert(all.sorted == batch.sorted,
        "closed-hour stream rows must equal the batch recurrence")
    } finally q.stop()
  }

  test("value-moment stream equals the batch moments at each trigger") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("vmom")
    val q = EventStreamOps.valueMomentsStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def batchOf(evs: Seq[StreamEvent]) =
        EventStreamOps.valueMoments(evs.toDF())
          .selectExpr("event_type", "n", "sv", "cast(svv as string)")
          .as[(String, Long, Long, String)].collect().toSeq.sorted
      val (a, b) = fixtureEvents.splitAt(100)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name)
        .selectExpr("event_type", "n", "sv", "cast(svv as string)")
        .as[(String, Long, Long, String)].collect().toSeq
      assert(s1.sorted == batchOf(a))
      in.addData(b); q.processAllAvailable()
      val all = spark.table(name)
        .selectExpr("event_type", "n", "sv", "cast(svv as string)")
        .as[(String, Long, Long, String)].collect().toSeq
      val s2 = all.diff(s1)
      assert(s2.sorted == batchOf(fixtureEvents),
        "trigger-2 moments lost carried state")
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("hll")
    val q = EventStreamOps.hllRegisterStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def regsOf(evs: Seq[StreamEvent]) =
        graft.pipeline.RelOps.hllRegisters(
          evs.toDF().select(col("event_type"), col("user_id")))
          .as[(String, Long, Long)].collect().toSeq.sorted
      // tiny first batch so batch 2 genuinely extends the sketch
      val (a, b) = fixtureEvents.splitAt(50)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name)
        .as[(String, Long, Long)].collect().toSeq
      assert(s1.sorted == regsOf(a), "trigger-1 registers != batch(a)")
      in.addData(b); q.processAllAvailable()
      // trigger 2's UPDATE rows = (all sink rows) minus trigger 1's —
      // each must ALREADY equal the full-corpus register for its key:
      // the new max folds the carried batch-1 state, so a state loss
      // (batch-2-only max) shows as a lower value here, which a
      // max-compaction over the sink would have masked
      val all = spark.table(name)
        .as[(String, Long, Long)].collect().toSeq
      val s2 = all.diff(s1)
      val full = regsOf(fixtureEvents).map(r => (r._1, r._2) -> r._3).toMap
      assert(s2.nonEmpty)
      s2.foreach { case (t, bkt, mj) =>
        assert(mj == full((t, bkt)), s"register ($t,$bkt) lost state")
      }
      // final state: trigger-2 rows + untouched trigger-1 rows ≡ batch
      val finalRegs = (s2.map(r => (r._1, r._2) -> r._3).toMap ++
        Map.empty).foldLeft(s1.map(r => (r._1, r._2) -> r._3).toMap)(_ + _)
      assert(finalRegs == full)
      // the boundary is real: trigger 2 re-emitted keys trigger 1 set
      assert(s2.map(r => (r._1, r._2)).toSet
        .intersect(s1.map(r => (r._1, r._2)).toSet).nonEmpty)
    } finally q.stop()
  }

  test("streaming SCD2 changelog compacts to the batch history table") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("scd2")
    val q = EventStreamOps.scd2Stream(in.toDS(),
        ttlMs = 60L * 86400L * 1000L)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // three batches split by global event time — per-key event-time
      // order holds across the boundaries
      val (a, rest) = fixtureEvents.splitAt(fixtureEvents.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { batch =>
        in.addData(batch); q.processAllAvailable()
      }
      val emitted = spark.table(name)
        .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
      // changelog compaction: per (user, event) a row is emitted current
      // exactly once and closed at most once — prefer the closed row
      val compacted = emitted.groupBy(r => (r._1, r._2))
        .map { case (_, rows) =>
          assert(rows.size <= 2 && rows.count(_._6 == 1L) == 1)
          rows.minBy(_._6)
        }.toSeq.sorted
      val batchTable = EventOps.eventHistoryScd2(spark, SF)
        .select("user_id", "event_id", "event_type", "valid_from_tus",
          "valid_to_tus", "is_current")
        .as[(Long, Long, String, Long, Long, Long)].collect().toSeq.sorted
      assert(compacted == batchTable)
      // at least one validity row must CLOSE across a batch boundary
      // (opened in one micro-batch, closed in a later one) — otherwise
      // the cross-batch state carry is untested
      val openedIn = a.map(_.event_id).toSet
      val closedLater = emitted.filter(r => r._6 == 0L &&
        openedIn.contains(r._2) &&
        !a.exists(e => e.user_id == r._1 && e.tns / 1000L == r._5))
      assert(emitted.count(_._6 == 0L) > 0)
      assert(closedLater.nonEmpty, "no cross-batch closure")
    } finally q.stop()
  }

  test("streaming column profiler equals the batch profile per trigger") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("prof")
    val q = EventStreamOps.columnProfileStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def batchOf(evs: Seq[StreamEvent]) =
        EventStreamOps.profileStats(evs.toDF())
          .as[(String, Long, Long, Long, Long, String, String, Long)]
          .collect().toSeq.sortBy(_._1)
      def latest() = {
        // update sink: the LAST row per col_name is the current state
        val rows = spark.table(name)
          .as[(String, Long, Long, Long, Long, String, String, Long)]
          .collect().toSeq
        rows.zipWithIndex.groupBy(_._1._1).values
          .map(_.maxBy(_._2)._1).toSeq.sortBy(_._1)
      }
      val (a, b) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      in.addData(a); q.processAllAvailable()
      assert(latest() == batchOf(a), "trigger-1 profile != batch(a)")
      in.addData(b); q.processAllAvailable()
      // trigger 2 folds carried state: profile must cover the FULL
      // history, not just batch b
      assert(latest() == batchOf(fixtureEvents),
        "cross-batch profile != batch(all)")
    } finally q.stop()
  }

  test("streaming per-column NDV registers equal the batch build") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    val name = freshName("ndv")
    val q = EventStreamOps.profileNdvStream(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try {
      def batchRegs(evs: Seq[StreamEvent]) =
        graft.pipeline.RelOps.hllRegistersBy(
          EventStreamOps.profileLong(evs.toDF())
            .where(col("repr").isNotNull)
            .select(col("col_name").as("k"), col("repr").as("v")))
          .as[(String, Long, Long)].collect().toSeq.sorted
      val (a, b) = fixtureEvents.splitAt(50)
      in.addData(a); q.processAllAvailable()
      val s1 = spark.table(name).as[(String, Long, Long)].collect().toSeq
      assert(s1.sorted == batchRegs(a), "trigger-1 registers != batch(a)")
      in.addData(b); q.processAllAvailable()
      val all = spark.table(name).as[(String, Long, Long)].collect().toSeq
      // final registers (last value per key) ≡ batch over everything
      val finalRegs = all.zipWithIndex.groupBy(r => (r._1._1, r._1._2))
        .view.mapValues(_.maxBy(_._2)._1._3).toMap
      val full = batchRegs(fixtureEvents)
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(finalRegs == full, "cross-batch registers != batch(all)")
    } finally q.stop()
  }
}
