package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed range join equals brute force, incl. bin boundaries") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val width = 100L
    // ts values intentionally dense around bin multiples
    val lefts = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, (rnd.nextInt(20) * 50).toLong))
    val rights = (1 to 150).map(i =>
      (1000L + i, rnd.nextInt(10).toLong, (rnd.nextInt(20) * 50).toLong))
    val l = lefts.toDF("lid", "k", "lts")
    val r = rights.toDF("rid", "k", "rts")
    val got = RangeJoin.withinRange(l, r, Seq("k"), "lts", "rts", width)
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    val want = (for {
      (lid, lk, lts) <- lefts
      (rid, rk, rts) <- rights
      if lk == rk && rts >= lts - width && rts <= lts
    } yield (lid, rid)).toSet
    assert(got === want)
    assert(want.nonEmpty) // the test actually exercised matches
  }

  test("range join plans an equi-join, not a cartesian product") {
    val s = spark
    import s.implicits._
    val l = (1 to 10).map(i => (i.toLong, 1L, i * 10L)).toDF("lid", "k", "lts")
    val r = (1 to 10).map(i => (100L + i, 1L, i * 10L)).toDF("rid", "k", "rts")
    val plan = RangeJoin.withinRange(l, r, Seq("k"), "lts", "rts", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
