package graft

import java.sql.Timestamp

import graft.streaming.{AsOfSideEvent, StreamAsOfJoin, StreamAsOfState}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

class StreamAsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)
  private def ev(side: String, sec: Long, id: Long, user: Long = 1L) =
    AsOfSideEvent(user, ts(sec), side, id)
  private def state(st: Option[StreamAsOfState], watermarkSec: Long,
                    timedOut: Boolean = false) =
    TestGroupState.create[StreamAsOfState](
      st.map(Optional.of[StreamAsOfState]).getOrElse(
        Optional.empty[StreamAsOfState]),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of[Long](watermarkSec * 1000),
      timedOut)

  test("eviction keeps only the latest mature right plus future rights") {
    val gs = state(None, watermarkSec = 20)
    val out = StreamAsOfJoin.process(3600000L)(1L, Iterator(
      ev("R", 10, 100), ev("R", 15, 101), ev("R", 30, 102)), gs)
    assert(out.isEmpty)
    // rights at 10s dominated by 15s (both <= W=20); 30s is the future
    assert(gs.get.rights === Seq((15000L, 101L), (30000L, 102L)))
  }

  test("a left waits for the watermark, then matches the latest earlier right") {
    val gs1 = state(None, watermarkSec = 5)
    val none = StreamAsOfJoin.process(3600000L)(1L, Iterator(
      ev("R", 10, 100), ev("L", 20, 900)), gs1)
    assert(none.isEmpty) // left ts 20 > W 5: buffered
    assert(gs1.get.pendingLefts === Seq((20000L, 900L)))
    // out-of-order right (ts 15 < buffered left's 20) arrives later;
    // then the watermark passes the left
    val gs2 = state(Some(gs1.get), watermarkSec = 25)
    val out = StreamAsOfJoin.process(3600000L)(1L,
      Iterator(ev("R", 15, 101)), gs2).toSeq
    assert(out.map(a => a.left_id -> a.asof_id) === Seq(900L -> Some(101L)))
    assert(gs2.get.pendingLefts.isEmpty)
  }

  test("a left with no earlier right emits None; empty state is removed") {
    val gs = state(None, watermarkSec = 50)
    val out = StreamAsOfJoin.process(3600000L)(1L,
      Iterator(ev("L", 20, 900)), gs).toSeq
    assert(out.map(a => a.left_id -> a.asof_id) === Seq(900L -> None))
    assert(gs.isRemoved) // nothing pending, nothing to keep
  }

  test("idle TTL wake clears lingering right history") {
    val gs = state(Some(StreamAsOfState(Seq((10000L, 100L)), Nil)),
      watermarkSec = 20)
    StreamAsOfJoin.process(1000L)(1L, Iterator.empty, gs)
    // no pending lefts: state kept (one mature right) with a TTL wake
    assert(gs.get.rights === Seq((10000L, 100L)))
    assert(gs.getTimeoutTimestampMs.get === 21000L)
    // the wake itself (timed out, no new data, nothing pending)
    // removes the state entirely — idle keys do not leak
    val woke = state(Some(gs.get), watermarkSec = 22, timedOut = true)
    val out = StreamAsOfJoin.process(1000L)(1L, Iterator.empty, woke)
    assert(out.isEmpty)
    assert(woke.isRemoved)
    // ...but an in-flight right ABOVE the watermark survives the wake
    // (it has not matured; dropping it would mis-join the next left)
    val woke2 = state(Some(StreamAsOfState(
      Seq((10000L, 100L), (30000L, 101L)), Nil)),
      watermarkSec = 20, timedOut = true)
    StreamAsOfJoin.process(1000L)(1L, Iterator.empty, woke2)
    assert(woke2.get.rights === Seq((30000L, 101L)))
  }

  test("state stays bounded under a sustained out-of-order feed") {
    // 200 micro-batches, 6 events each, every event up to 8 s out of
    // order, watermark lagging 10 s behind the feed head. The eviction
    // invariant must hold the per-key state at the in-flight horizon
    // (≤ ~5 batch-steps of each stream + one dominated right) — a
    // CONSTANT, measured, not a function of the 1200 events streamed.
    val rnd = new scala.util.Random(17)
    var st: Option[StreamAsOfState] = None
    var emitted = 0
    var maxRows = 0
    val batches = 200
    for (b <- 1 to batches) {
      val baseSec = 20L + b * 2L
      val wSec = baseSec - 10
      val evs = (1 to 6).map { i =>
        val side = if (i % 2 == 0) "L" else "R"
        // jitter ≤ 7 s back: late, but inside the lateness tolerance
        ev(side, baseSec - rnd.nextInt(8), b * 100L + i)
      }
      val gs = state(st, watermarkSec = wSec)
      emitted += StreamAsOfJoin.process(3600000L)(1L, evs.iterator, gs).size
      st = if (gs.isRemoved) None else Some(gs.get)
      val rows = st.map(s => s.rights.size + s.pendingLefts.size)
        .getOrElse(0)
      maxRows = math.max(maxRows, rows)
    }
    assert(maxRows <= 48,
      s"per-key state must track the horizon, not the stream: $maxRows")
    // drain: advance the watermark past everything — every left sent
    // (3 per batch) must have been emitted exactly once, and the
    // fully-drained key's state must be removed
    val fin = state(st, watermarkSec = 1000000L)
    emitted += StreamAsOfJoin.process(3600000L)(1L, Iterator.empty, fin).size
    assert(emitted === batches * 3, s"every left exactly once: $emitted")
    assert(fin.isRemoved || fin.get.pendingLefts.isEmpty)
  }

  test("end-to-end: out-of-order right is matched, eager join would miss it") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val lefts = MemoryStream[(Long, Timestamp, Long)]
    val rights = MemoryStream[(Long, Timestamp, Long)]
    def frame(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF().toDF("user_id", "ts", "event_id")
    val q = StreamAsOfJoin.asofStream(frame(lefts), frame(rights),
        delay = "5 seconds")
      .writeStream.format("memory").queryName("asof_ss")
      .outputMode("append").start()
    try {
      // batch 1: the left arrives BEFORE the right it must match
      lefts.addData((1L, ts(20), 900L)); rights.addData((1L, ts(10), 100L))
      q.processAllAvailable()
      // batch 2: out-of-order right at 15s (< left's 20s), plus both-side
      // dummies that advance the min-of-sources watermark past the left
      rights.addData((1L, ts(15), 101L), (99L, ts(40), 555L))
      lefts.addData((99L, ts(40), 556L))
      q.processAllAvailable()
      // batch 3: any data so the new watermark (35s) is applied
      lefts.addData((98L, ts(50), 557L)); rights.addData((98L, ts(50), 558L))
      q.processAllAvailable()
      val got = s.sql(
          "SELECT left_id, asof_id FROM asof_ss WHERE user_id = 1")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // matched to the 15s right, which arrived a batch after the left
      assert(got === Map(900L -> Some(101L)))
    } finally q.stop()
  }
}
