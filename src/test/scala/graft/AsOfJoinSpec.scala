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
