package graft

import java.nio.file.Files

import graft.streaming.{EventStream, RankRederivation, RawKeyEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A realistic keystroke script: type, page, navigate, commit. */
  private val script: Seq[RawKeyEvent] = Seq(
    // session A: type "nihao", menu shows, commit first choice via space
    RawKeyEvent("A", 1, "key", Some("n"), Some("n"), Some(Seq("你", "拟")), None),
    RawKeyEvent("A", 2, "key", Some("i"), Some("ni"), Some(Seq("你", "泥", "逆")), None),
    RawKeyEvent("A", 3, "key", Some("space"), Some("nihao"), Some(Seq("你好", "拟好")), None),
    RawKeyEvent("A", 4, "commit", None, None, None, Some("你好")),
    // session A: second page selection via digit 2 → rank 6+1=7
    RawKeyEvent("A", 5, "key", Some("s"), Some("s"), Some(Seq("是", "事", "时")), None),
    RawKeyEvent("A", 6, "key", Some("Page_Down"), Some("s"), Some(Seq("士", "世", "市")), None),
    RawKeyEvent("A", 7, "key", Some("2"), Some("s"), Some(Seq("士", "世", "市")), None),
    RawKeyEvent("A", 8, "commit", None, None, None, Some("世")),
    // session A: direct commit with no menu
    RawKeyEvent("A", 9, "key", Some("Return"), None, None, None),
    RawKeyEvent("A", 10, "commit", None, None, None, Some("raw")),
    // session B (independent state): space commit of 2nd candidate → rank 1
    RawKeyEvent("B", 1, "key", Some("h"), Some("hao"), Some(Seq("好", "号")), None),
    RawKeyEvent("B", 2, "key", Some("space"), Some("hao"), Some(Seq("好", "号")), None),
    RawKeyEvent("B", 3, "commit", None, None, None, Some("号")))

  private def checkDerived(rows: Seq[graft.streaming.DerivedCommit]): Unit = {
    val byKey = rows.map(r => (r.session_id, r.seq) -> r).toMap
    assert(rows.size === 4)
    val a4 = byKey(("A", 4L))
    assert(a4.selected_candidate_rank === 0) // first choice via space
    assert(a4.selection_method === "first_choice_space")
    assert(a4.source_first_candidate === Some("你好"))
    val a8 = byKey(("A", 8L))
    assert(a8.selected_candidate_rank === 7) // page 1 * 6 + (2-1)
    assert(a8.selection_method === "nth_choice_number_2")
    val a10 = byKey(("A", 10L))
    assert(a10.selected_candidate_rank === -1)
    assert(a10.selection_method === "direct_commit_no_menu")
    val b3 = byKey(("B", 3L))
    assert(b3.selected_candidate_rank === 1) // 2nd candidate, page 0
    assert(b3.selection_method === "nth_choice_space")
  }

  test("T2-T4 state machine derives producer-identical commits (batch)") {
    val s = spark
    import s.implicits._
    checkDerived(RankRederivation.deriveCommits(script.toDS()).collect().toSeq)
  }

  test("T2-T4 state machine over a real stream, state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[RawKeyEvent]
    val q = RankRederivation.deriveCommits(mem.toDS())
      .writeStream.format("memory").queryName("derived")
      .outputMode("append").start()
    try {
      // split mid-session: snapshot state must survive the batch boundary
      val (b1, b2) = script.splitAt(6)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val rows = s.table("derived").as[graft.streaming.DerivedCommit]
        .collect().toSeq
      checkDerived(rows)
    } finally q.stop()
  }

  test("S4/T8: file-source stream round trip with corrupt lines") {
    val inDir = Files.createTempDirectory("graft-stream-in")
    val outDir = Files.createTempDirectory("graft-stream-out")
    val ckDir = Files.createTempDirectory("graft-stream-ck")
    Files.write(inDir.resolve("log1.jsonl"),
      Fixtures.mixedLog.mkString("\n").getBytes("UTF-8"))
    val stream = EventStream.readJsonlStream(spark, inDir.toString)
      .filter(col("event_type") === "text_committed")
    val q = EventStream.writeJsonlStream(stream, outDir.toString,
      ckDir.toString)
    try q.processAllAvailable() finally q.stop()
    val back = graft.io.EventLogReader.readJsonl(spark, outDir.toString)
    assert(back.count() === 14)
  }

  test("T1: session-window metrics over event time") {
    val sessions = EventStream.sessionMetrics(
      graft.io.EventLogReader.readJsonl(spark,
        Fixtures.writeJsonl(Fixtures.mixedLog).toString),
      gap = "30 minutes", watermark = "0 seconds")
    val rows = sessions.collect()
    // all fixture commits are within 14s → one session
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("commits") === 14)
    assert(rows.head.getAs[Long]("selections") === 9)
    assert(rows.head.getAs[Long]("misses") === 5)
  }
}
