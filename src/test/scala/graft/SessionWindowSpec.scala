package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantics of the native `session_window` operator that
  * q32_session_window relies on — in particular the EXACT-BOUNDARY
  * rule the DuckDB oracle must mirror: Spark session windows are
  * `[first, last + gap)` but MERGE when they touch, so an event
  * arriving exactly `gap` after its predecessor still JOINS the
  * session. The oracle's gaps-and-islands break is therefore
  * `gap_us > gap` (not `>=`) — the same convention t1_sessionize
  * uses — and this spec is the executable proof it matches the
  * operator (verified empirically: this test was first written with
  * the opposite expectation and Spark merged the two events). */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** (user, epoch-second) rows → session rows via session_window. */
  private def sessions(gap: String, rows: Seq[(Long, Long)]): Seq[Row] = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("t"))
      .groupBy(col("user_id"), session_window(col("t"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
      .collect().toSeq
  }

  test("events exactly gap apart MERGE (touching windows coalesce)") {
    // gap = 60 s; events at t=0 and t=60 — the first window is
    // [0, 60) and the second starts exactly at its end; Spark
    // coalesces them into one session ending at 120.
    val r = sessions("60 seconds", Seq((1L, 0L), (1L, 60L)))
    assert(r.size === 1)
    assert(r.head.getAs[Long]("n_events") === 2L)
    assert(r.head.getAs[Long]("start_us") === 0L)
    assert(r.head.getAs[Long]("end_us") === 120L * 1000000L)
    // one µs past the gap DOES split
    val r2 = sessions("60 seconds", Seq((1L, 0L), (1L, 61L)))
    assert(r2.map(_.getAs[Long]("n_events")) === Seq(1L, 1L))
  }

  test("events strictly inside the gap merge, and the end extends") {
    val r = sessions("60 seconds", Seq((1L, 0L), (1L, 59L), (1L, 100L)))
    assert(r.size === 1)
    val row = r.head
    assert(row.getAs[Long]("n_events") === 3L)
    assert(row.getAs[Long]("start_us") === 0L)
    // end = last event + gap
    assert(row.getAs[Long]("end_us") === (100L + 60L) * 1000000L)
  }

  test("sessionization is per-key and order-insensitive in batch") {
    // interleaved users, deliberately shuffled input order
    val rows = Seq((2L, 500L), (1L, 0L), (2L, 10L), (1L, 30L),
      (1L, 200L), (2L, 520L))
    val r = sessions("60 seconds", rows)
    val byUser = r.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events"))).toMap
    // user 1: {0,30} then {200}; user 2: {10} then {500,520}
    assert(byUser(1L) === Seq(2L, 1L))
    assert(byUser(2L) === Seq(1L, 2L))
  }

  test("q32's µs flooring matches `ts div 1000` on ns longs") {
    val s = spark
    import s.implicits._
    // 1234567891234567891 ns → 1234567891234567 µs (floor, positive)
    val us = Seq(1234567891234567891L).toDF("ts")
      .select(expr("ts div 1000").as("us")).head().getAs[Long]("us")
    assert(us === 1234567891234567L)
  }
}
