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
}
