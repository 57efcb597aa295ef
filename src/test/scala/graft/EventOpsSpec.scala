package graft

import graft.ops.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("readEventsTable restores the caller's session timezone and " +
      "yields tz-independent ts") {
    val s = spark
    val tzKey = "spark.sql.session.timeZone"
    val dir = "/root/testdata/sf0.001"
    val before = s.conf.get(tzKey)
    val baseline = graft.ops.SyntheticEvents.readEventsTable(s, dir)
      .agg(min(col("ts")), max(col("ts"))).head()
    try {
      s.conf.set(tzKey, "America/New_York")
      val df = graft.ops.SyntheticEvents.readEventsTable(s, dir)
      // the UTC pin must NOT leak past the call (analysis is eager,
      // the plan's cast timezone is already baked in)
      assert(s.conf.get(tzKey) === "America/New_York")
      // and the normalized epoch-ns values are session-tz-independent
      val got = df.agg(min(col("ts")), max(col("ts"))).head()
      assert(got === baseline)
    } finally s.conf.set(tzKey, before)
  }

  test("T6: keypress subtype classification matches the producer table") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("Up", false, "menu_navigation"),
      ("Page_Down", false, "menu_navigation"),
      ("Next", false, "menu_navigation"),
      ("Escape", false, "input_rejected"),
      ("Control_Left", true, "manual_segmentation"),
      ("Control_Left", false, "other_key"), // no ctrl modifier
      ("a", false, "buffer_edit"),
      ("BackSpace", false, "buffer_edit"),
      ("Return", false, "other_key"))
    val got = cases.toDF("key", "ctrl", "want")
      .withColumn("got", EventOps.eventSubtype(col("key"), col("ctrl")))
      .collect()
    got.foreach(r => assert(r.getAs[String]("got") === r.getAs[String]("want"),
      r.getAs[String]("key")))
  }

  test("T4: batch rank derivation matches the producer arithmetic") {
    val s = spark
    import s.implicits._
    // (committed, candidates, page, key, wantRank)
    val cases = Seq(
      ("你好", Seq("拟好", "你好"), 0, Some("space"), 1),  // found at idx 1
      ("你好", Seq("你好", "拟好"), 0, Some("space"), 0),  // first choice
      ("世", Seq("士", "世", "市"), 1, Some("2"), 7),      // page*6 + (2-1)
      ("缺", Seq("甲", "乙"), 2, Some("space"), 12),       // not found → page*6
      ("raw", Seq.empty[String], 0, None, -1))             // no pending key
    val df = cases.map { case (c, cand, p, k, w) => (c, cand, p, k, w) }
      .toDF("committed", "candidates", "page", "key", "want")
    val got = df.withColumn("got", EventOps.deriveRank(col("committed"),
      col("candidates"), col("page"), col("key"))).collect()
    got.foreach(r => assert(r.getAs[Int]("got") === r.getAs[Int]("want"),
      r.getAs[String]("committed")))
  }

  test("P6: defensive column intersection keeps only existing columns") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    assert(EventOps.selectExisting(df, Seq("y", "missing", "x")).columns.toSeq
      === Seq("y", "x"))
  }
}
