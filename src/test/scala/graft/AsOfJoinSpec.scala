package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("as-of join matches a brute-force reference, incl. equal-ts ties") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    // small ts domain forces equal-ts collisions
    val lefts = (1 to 120).map(i =>
      (i.toLong, (rnd.nextInt(20)).toLong, rnd.nextInt(5).toLong))
    val rights = (1 to 80).map(i =>
      (1000L + i, rnd.nextInt(20).toLong, rnd.nextInt(5).toLong))
    val l = lefts.toDF("id", "ts", "k")
    val r = rights.toDF("rid", "ts", "k")
      .select(col("k"), col("ts"), col("rid"))
    val got = AsOfJoin.asofJoin(l, r, Seq("k"), "ts", Seq("rid"),
        tieBreak = Some("rid"))
      .select(col("id"), col("asof_rid"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    lefts.foreach { case (id, ts, k) =>
      // non-strict: latest right with ts <= left ts; ties by max rid
      val want = rights.filter(rr => rr._3 == k && rr._2 <= ts)
        .sortBy(rr => (rr._2, rr._1)).lastOption.map(_._1)
      assert(got(id) === want, s"left id=$id ts=$ts k=$k")
    }
  }

  test("the latest right row is carried WHOLE, not per-column (no torn rows)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 3L, 1L)).toDF("id", "ts", "k")
    val r = Seq(
      (1L, 1L, Some(10L), Some(20L)),  // older: both fields set
      (1L, 2L, None, Some(30L)))       // latest: a is null
      .toDF("k", "ts", "a", "b")
    for (frame <- Seq(
      AsOfJoin.asofJoin(l, r, Seq("k"), "ts", Seq("a", "b"),
        tieBreak = Some("b")),
      AsOfJoin.asofStaticRight(l, r, Seq("k"), "ts", Seq("a", "b"),
        tieBreak = Some("b")),
      graft.plans.NativeAsOfJoin.asofJoin(l, r, Seq("k"), "ts",
        Seq("a", "b"), tieBreak = Some("b")))) {
      val row = frame.select("asof_a", "asof_b").head()
      // the latest row (ts=2) is taken as-is: a stays null, never
      // back-filled from the older row into a composite that never
      // existed
      assert(row.isNullAt(0) && row.getLong(1) === 30L)
    }
  }

  test("null join keys group and match identically across all three forms") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 5L, Option.empty[Long]),
                (2L, 5L, Some(1L))).toDF("id", "ts", "k")
    val r = Seq((Option.empty[Long], 1L, 7L),
                (Some(1L), 1L, 8L)).toDF("k", "ts", "rid")
    for (frame <- Seq(
      AsOfJoin.asofJoin(l, r, Seq("k"), "ts", Seq("rid")),
      AsOfJoin.asofStaticRight(l, r, Seq("k"), "ts", Seq("rid")),
      graft.plans.NativeAsOfJoin.asofJoin(l, r, Seq("k"), "ts",
        Seq("rid")))) {
      val got = frame.select("id", "asof_rid").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === Map(1L -> 7L, 2L -> 8L))
    }
  }

  test("native operator is differential-equal to the union-window form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // collisions on ts AND keys; some left rows with no match at all
    val lefts = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(6).toLong))
    val rights = (1 to 90).map(i =>
      (1000L + i, rnd.nextInt(25).toLong, rnd.nextInt(8).toLong))
    val l = lefts.toDF("id", "ts", "k")
    val r = rights.toDF("rid", "ts", "k")
      .select(col("k"), col("ts"), col("rid"))
    for (strict <- Seq(false, true)) {
      val window = graft.ops.AsOfJoin.asofJoin(l, r, Seq("k"), "ts",
          Seq("rid"), tieBreak = Some("rid"), strict = strict)
        .select("id", "asof_rid").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      val native = graft.plans.NativeAsOfJoin.asofJoin(l, r, Seq("k"),
          "ts", Seq("rid"), tieBreak = Some("rid"), strict = strict)
        .select("id", "asof_rid").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(native === window, s"strict=$strict")
    }
  }

  test("native operator plans one exchange+sort per side, no union/window") {
    val s = spark
    import s.implicits._
    val l = (1 to 50).map(i => (i.toLong, i.toLong, (i % 3).toLong))
      .toDF("id", "ts", "k")
    val r = (1 to 30).map(i => (100L + i, i.toLong, (i % 3).toLong))
      .toDF("rid", "ts", "k").select(col("k"), col("ts"), col("rid"))
    val df = graft.plans.NativeAsOfJoin.asofJoin(l, r, Seq("k"), "ts",
      Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec expected:\n$plan")
    assert(!plan.contains("Window"), s"no window state:\n$plan")
    assert(!plan.contains("Union"), s"no union widening:\n$plan")
    df.collect() // and it runs
  }

  test("native self-as-of (shared lineage) resolves without ambiguity") {
    val s = spark
    import s.implicits._
    val events = (1 to 40).map(i =>
      (i.toLong, i.toLong, (i % 2).toLong, if (i % 3 == 0) "b" else "a"))
      .toDF("id", "ts", "k", "side")
    val l = events.filter(col("side") === "a")
    val r = events.filter(col("side") === "b")
      .select(col("k"), col("ts"), col("id").as("rid"))
    val got = graft.plans.NativeAsOfJoin.asofJoin(l, r, Seq("k"), "ts",
        Seq("rid"), tieBreak = Some("rid"))
      .select("id", "asof_rid").collect()
    assert(got.length === l.count())
  }

  test("static-right as-of is differential-equal to the union-window form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val lefts = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(6).toLong))
    val rights = (1 to 60).map(i =>
      (1000L + i, rnd.nextInt(25).toLong, rnd.nextInt(8).toLong))
    val l = lefts.toDF("id", "ts", "k")
    val r = rights.toDF("rid", "ts", "k")
      .select(col("k"), col("ts"), col("rid"))
    for (strict <- Seq(false, true)) {
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      val window = norm(AsOfJoin.asofJoin(l, r, Seq("k"), "ts",
          Seq("rid"), tieBreak = Some("rid"), strict = strict)
        .select("id", "asof_rid").collect())
      val static = norm(AsOfJoin.asofStaticRight(l, r, Seq("k"), "ts",
          Seq("rid"), tieBreak = Some("rid"), strict = strict)
        .select("id", "asof_rid").collect())
      assert(static === window, s"strict=$strict")
    }
  }

  test("static-right as-of runs over a stream in append mode, stateless") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val static = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 200L))
      .toDF("k", "ts", "rid")
    val mem = MemoryStream[(Long, Long, Long)]
    val stream = mem.toDF().toDF("id", "ts", "k")
    val out = AsOfJoin.asofStaticRight(stream, static, Seq("k"), "ts",
        Seq("rid"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, 15L, 1L), (2L, 25L, 1L), (3L, 4L, 2L), (4L, 9L, 9L))
      out.processAllAvailable()
      val got = s.sql("SELECT id, asof_rid FROM asof_stream").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(got === Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
    } finally out.stop()
  }

  test("GraftExtensions injects the as-of planner strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    val strategies =
      org.apache.spark.sql.GraftBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
  }

  test("strict mode excludes same-timestamp right rows") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("id", "ts", "k")
    val r = Seq((100L, 10L, 1L), (99L, 9L, 1L)).toDF("rid", "ts", "k")
      .select(col("k"), col("ts"), col("rid"))
    def run(strict: Boolean) = AsOfJoin.asofJoin(l, r, Seq("k"), "ts",
        Seq("rid"), tieBreak = Some("rid"), strict = strict)
      .select("asof_rid").head()
    assert(run(strict = false).getLong(0) === 100L) // same-ts visible
    assert(run(strict = true).getLong(0) === 99L)   // only earlier
  }
}
