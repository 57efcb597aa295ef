package graft

import graft.streaming.{FunnelEvent, FunnelState, FunnelStream}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def gs(st: Option[FunnelState]) =
    TestGroupState.create[FunnelState](
      st.map(Optional.of[FunnelState]).getOrElse(
        Optional.empty[FunnelState]),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long],
      hasTimedOut = false)

  test("step function: strict bounds, deadlines, first-qualifying") {
    val h = FunnelStream.HourNs
    val state = gs(None)
    val hits = FunnelStream.processUser(7L, Iterator(
        FunnelEvent(7L, "click", -5L),      // click before any view: no
        FunnelEvent(7L, "view", 0L),        // stage 1
        FunnelEvent(7L, "view", 5L),        // first-qualifying: ignored
        FunnelEvent(7L, "click", 0L),       // not strictly after t1: no
        FunnelEvent(7L, "click", 10L),      // stage 2
        FunnelEvent(7L, "purchase", 10L),   // not strictly after t2: no
        FunnelEvent(7L, "purchase", 10L + h)), // past the deadline: no
      state, deadlineNs = h).toSeq
    assert(hits.map(x => (x.stage, x.ts)) ===
      Seq(("1_view", 0L), ("2_click", 10L)))
    assert(state.get === FunnelState(Some(0L), Some(10L), None))
  }

  test("step function: state carries across micro-batches") {
    val afterView = gs(Some(FunnelState(Some(100L), None, None)))
    val hits = FunnelStream.processUser(7L,
      Iterator(FunnelEvent(7L, "click", 150L)), afterView,
      FunnelStream.HourNs).toSeq
    assert(hits.map(_.stage) === Seq("2_click"))
    assert(afterView.get.t2 === Some(150L))
  }

  test("idle users are evicted when an idleTimeout is configured") {
    val timedOut = TestGroupState.create[FunnelState](
      Optional.of(FunnelState(Some(1L), None, None)),
      GroupStateTimeout.ProcessingTimeTimeout, 100L,
      Optional.empty[Long], hasTimedOut = true)
    val out = FunnelStream.processUser(7L, Iterator.empty, timedOut,
      FunnelStream.HourNs, idleTimeout = Some("1 hour")).toSeq
    assert(out.isEmpty)
    assert(timedOut.isRemoved)
  }

  test("a per-user batch over the cap fails fast, not OOM") {
    val state = gs(None)
    val flood = Iterator.tabulate(FunnelStream.MaxBatchEventsPerUser + 1)(
      i => FunnelEvent(7L, "view", i.toLong))
    val e = intercept[IllegalArgumentException] {
      FunnelStream.processUser(7L, flood, state, FunnelStream.HourNs)
    }
    assert(e.getMessage.contains("exceeded"))
  }

  test("a malformed idleTimeout fails at query construction") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(Seq.empty[FunnelEvent])
    val e = intercept[IllegalArgumentException] {
      FunnelStream.stageHits(ds, idleTimeout = Some("1 hr"))
    }
    assert(e.getMessage.contains("cannot parse"))
  }

  test("event-time step arms the timeout on the event axis") {
    val st = TestGroupState.create[FunnelState](
      Optional.empty[FunnelState], GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(5000L), hasTimedOut = false)
    val idleNs = 3600L * 1000 * 1000 * 1000
    FunnelStream.processUserEventTime(7L,
      Iterator(FunnelEvent(7L, "view", 6000L * 1000000)), st,
      FunnelStream.HourNs, idleNs).toSeq
    // armed at last event (6000 ms) + TTL — not at any wall-clock time
    assert(st.getTimeoutTimestampMs.get === 6000L + 3600000L)
  }

  test("event-time eviction: advancing the WATERMARK evicts idle users") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val h = FunnelStream.HourNs
    val mem = MemoryStream[FunnelEvent]
    // delay 10s, idle TTL 1h — all on the event axis; the wall clock
    // never advances meaningfully inside this test
    val q = FunnelStream.stageHitsEventTime(mem.toDS(), deadlineNs = h,
        delay = "10 seconds", idleTtl = "1 hour")
      .writeStream.format("memory").queryName("funnel_et")
      .outputMode("append").start()
    try {
      def feed(evs: FunnelEvent*): Unit = {
        mem.addData(evs.toIndexedSeq); q.processAllAvailable()
      }
      feed(FunnelEvent(7L, "view", 1000L * 1000000))       // 1_view
      feed(FunnelEvent(999L, "noop", 10 * h))              // wm -> ~10h
      feed(FunnelEvent(999L, "noop", 10 * h + 1000000000L)) // fire timeouts
      // user 7 was evicted by WATERMARK passage (1s + 1h << 10h), so a
      // fresh view re-enters the funnel and emits 1_view AGAIN; without
      // eviction first-qualifying would suppress it
      feed(FunnelEvent(7L, "view", 11 * h))
      val views = s.table("funnel_et")
        .filter(col("user_id") === 7 && col("stage") === "1_view")
        .count()
      assert(views === 2L)
    } finally q.stop()
  }

  test("buffered step holds events above the watermark, applies in order") {
    import graft.streaming.BufferedFunnelState
    val h = FunnelStream.HourNs
    // click arrives FIRST (watermark at 0: it must wait, not be dropped)
    val st1 = TestGroupState.create[BufferedFunnelState](
      Optional.empty[BufferedFunnelState],
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L),
      hasTimedOut = false)
    val out1 = FunnelStream.processUserBuffered(7L,
      Iterator(FunnelEvent(7L, "click", 600L * 1000000000L)), st1, h,
      idleNs = 24 * h).toSeq
    assert(out1.isEmpty)
    assert(st1.get.buf.map(_.event_type) === Seq("click"))
    // the view arrives a batch later; watermark then passes both —
    // they apply in EVENT-time order and both stages hit
    val st2 = TestGroupState.create[BufferedFunnelState](
      Optional.of(st1.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(700L * 1000), hasTimedOut = false)
    val out2 = FunnelStream.processUserBuffered(7L,
      Iterator(FunnelEvent(7L, "view", 0L)), st2, h,
      idleNs = 24 * h).toSeq
    assert(out2.map(_.stage) === Seq("1_view", "2_click"))
    assert(st2.get.buf.isEmpty)
  }

  test("buffered funnel: a click arriving a batch BEFORE its view counts") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val h = FunnelStream.HourNs
    val mem = MemoryStream[FunnelEvent]
    val q = FunnelStream.stageHitsBuffered(mem.toDS(), deadlineNs = h,
        delay = "2 hours", idleTtl = "240 hours")
      .writeStream.format("memory").queryName("funnel_buf")
      .outputMode("append").start()
    try {
      def feed(evs: FunnelEvent*): Unit = {
        mem.addData(evs.toIndexedSeq); q.processAllAvailable()
      }
      // cross-batch disorder: the click lands a whole micro-batch
      // before the view it depends on
      feed(FunnelEvent(7L, "click", 600L * 1000000000L))
      feed(FunnelEvent(7L, "view", 1000000000L))
      // advance the watermark past both, then one more batch so the
      // maturation timeout fires
      feed(FunnelEvent(999L, "noop", 10 * h))
      feed(FunnelEvent(999L, "noop", 10 * h + 1000000000L))
      val got = s.table("funnel_buf").orderBy("ts")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(got === Seq(("1_view", 1000000000L),
        ("2_click", 600L * 1000000000L)))
    } finally q.stop()
  }

  test("buffered funnel matches batch q30 under a SHUFFLED feed") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.SyntheticEvents.readEventsTable(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent].collect()
      // deterministic shuffle: order by a hash, so batches interleave
      // users and times arbitrarily — the adversarial delivery order
      .sortBy(e => (e.user_id * 2654435761L + e.ts).##)
    val batch = SparkEntry.queries("q30_funnel")(s, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxTs = ev.map(_.ts).max
    val mem = MemoryStream[FunnelEvent]
    // the watermark delay must cover the full disorder span of the
    // shuffled feed; sf0.001 events span ~a month → 2400 hours
    val q = FunnelStream.stageHitsBuffered(mem.toDS(),
        delay = "2400 hours", idleTtl = "24000 hours")
      .writeStream.format("memory").queryName("funnel_shuf")
      .outputMode("append").start()
    try {
      ev.grouped(ev.length / 4 + 1).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // sentinel far past everything: watermark sails past every real
      // event; second sentinel batch lets the flush timeouts fire
      val far = maxTs + 24000L * 3600 * 1000000000L
      mem.addData(FunnelEvent(999999L, "noop", far))
      q.processAllAvailable()
      mem.addData(FunnelEvent(999999L, "noop", far + 1000000000L))
      q.processAllAvailable()
      val got = s.table("funnel_shuf").groupBy("stage")
        .agg(countDistinct(col("user_id")).as("users"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === batch.filter(_._2 > 0))
      assert(got.getOrElse("1_view", 0L) > 0)
    } finally q.stop()
  }

  test("streaming funnel matches the batch q30 stage sets on fixtures") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.SyntheticEvents.readEventsTable(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent].collect().sortBy(_.ts)
    val batch = SparkEntry.queries("q30_funnel")(s, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[FunnelEvent]
    val q = FunnelStream.stageHits(mem.toDS())
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").start()
    try {
      // three in-order micro-batches (cross-batch order preserved)
      ev.grouped(ev.length / 3 + 1).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = s.table("funnel_hits").groupBy("stage")
        .agg(countDistinct(col("user_id")).as("users"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // the live stream reaches exactly the users the daily batch
      // report counts (stages nobody reached emit no hits)
      assert(got === batch.filter(_._2 > 0))
      assert(got.getOrElse("1_view", 0L) > 0)
    } finally q.stop()
  }

  test("batch replay (cogroup fold) matches q30 on every time prefix " +
    "and the streaming emissions per batch") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val evDs = graft.ops.SyntheticEvents.readEventsTable(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent]
    val ev = evDs.collect()
    val (mn, mx) = (ev.map(_.ts).min, ev.map(_.ts).max)
    val span = mx - mn + 1
    def batchOf(e: FunnelEvent): Long = (e.ts - mn) * 3 / span
    val batches = (0L to 2L).map(b =>
      evDs.filter((e: FunnelEvent) => batchOf(e) == b))
    val perBatch = FunnelStream.replayStageHits(batches)
    // cumulative emissions after prefix b == one-shot q30 fold over
    // the prefix events (reference: in-order scala fold of the same
    // applyEvent semantics, independently via per-user min chains)
    var cumHits = Map.empty[(Long, String), Long] // (user, stage) -> ts
    (0 to 2).foreach { b =>
      perBatch(b).collect().foreach { h =>
        assert(!cumHits.contains((h.user_id, h.stage)),
          s"stage ${h.stage} emitted twice for user ${h.user_id}")
        cumHits += (h.user_id, h.stage) -> h.ts
      }
      val prefix = ev.filter(e => batchOf(e) <= b)
      val h = FunnelStream.HourNs
      val t1 = prefix.filter(_.event_type == "view")
        .groupBy(_.user_id).map { case (u, es) => u -> es.map(_.ts).min }
      val t2 = prefix.filter(_.event_type == "click")
        .groupBy(_.user_id).flatMap { case (u, es) =>
          t1.get(u).flatMap { v =>
            val q = es.map(_.ts).filter(t => t > v && t < v + h)
            if (q.nonEmpty) Some(u -> q.min) else None } }
      val t3 = prefix.filter(_.event_type == "purchase")
        .groupBy(_.user_id).flatMap { case (u, es) =>
          t2.get(u).flatMap { c =>
            val q = es.map(_.ts).filter(t => t > c && t < c + h)
            if (q.nonEmpty) Some(u -> q.min) else None } }
      val want =
        t1.map { case (u, t) => (u, "1_view") -> t } ++
          t2.map { case (u, t) => (u, "2_click") -> t } ++
          t3.map { case (u, t) => (u, "3_purchase") -> t }
      assert(cumHits === want, s"prefix $b diverged")
    }
    assert(cumHits.nonEmpty)
  }
}
