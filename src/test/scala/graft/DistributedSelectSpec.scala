package graft

import graft.ops.DistributedSelect
import org.scalatest.funsuite.AnyFunSuite

class DistributedSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("kthSmallest: exact order statistics, duplicates, extremes") {
    val s = spark
    import s.implicits._
    // duplicates + unsorted; sorted: 1,2,2,3,3,3,7,9,9,11
    val vals = Seq(9.0, 3.0, 2.0, 11.0, 3.0, 1.0, 7.0, 9.0, 2.0, 3.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sorted = vals.sorted
    (1 to vals.length).foreach { k =>
      // threshold 2 forces real narrowing rounds for most k
      val (got, _) = DistributedSelect.kthSmallest(df, "v", k,
        buckets = 4, threshold = 2)
      assert(got === sorted(k - 1), s"k=$k")
    }
  }

  test("kthSmallest: all-equal values collapse the range") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map((_, 42.5)).toDF("id", "v")
    val (got, _) = DistributedSelect.kthSmallest(df, "v", 50,
      buckets = 8, threshold = 10)
    assert(got === 42.5)
  }

  test("kthSmallest: nulls and NaN are excluded; k out of range throws") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, null),
      (3L, Double.NaN), (4L, 1.0), (5L, 3.0)).toDF("id", "v")
    val (got, _) = DistributedSelect.kthSmallest(df, "v", 3,
      buckets = 4, threshold = 1)
    assert(got === 5.0) // comparable values are 1, 3, 5
    intercept[IllegalArgumentException] {
      DistributedSelect.kthSmallest(df, "v", 4, buckets = 4,
        threshold = 1)
    }
  }

  test("exactQuantile median matches the sorted reference") {
    val s = spark
    import s.implicits._
    // 1001 distinct values, shuffled deterministically by hash-ish key
    val vals = (1 to 1001).map(i => ((i * 137) % 1009).toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val r = DistributedSelect.exactQuantile(df, "v", 0.5,
      buckets = 16, threshold = 50).head()
    val sorted = vals.sorted
    val k = math.ceil(0.5 * vals.length).toLong
    assert(r.getDouble(0) === sorted(k.toInt - 1))
    assert(r.getLong(1) === vals.length.toLong)
    assert(r.getLong(2) === k)
  }

  test("kthSmallest: ±Infinity stays in the multiset and resolves exactly") {
    val s = spark
    import s.implicits._
    val ninf = Double.NegativeInfinity
    val pinf = Double.PositiveInfinity
    // sorted: -Inf, -Inf, 1, 2, 3, +Inf  (NaN/null excluded)
    val df = Seq[(Long, java.lang.Double)]((1L, 3.0), (2L, ninf),
      (3L, pinf), (4L, 1.0), (5L, ninf), (6L, 2.0), (7L, Double.NaN),
      (8L, null)).toDF("id", "v")
    val sorted = Seq(ninf, ninf, 1.0, 2.0, 3.0, pinf)
    (1 to 6).foreach { k =>
      val (got, _) = DistributedSelect.kthSmallest(df, "v", k,
        buckets = 4, threshold = 2)
      assert(got === sorted(k - 1), s"k=$k")
    }
    intercept[IllegalArgumentException] {
      DistributedSelect.kthSmallest(df, "v", 7, buckets = 4,
        threshold = 2)
    }
  }

  test("kthSmallest: oversized threshold fails loudly, never truncates") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      DistributedSelect.kthSmallest(df, "v", 1,
        threshold = Int.MaxValue.toLong + 1)
    }
  }

  test("narrowing terminates under threshold pressure and stays exact") {
    val s = spark
    import s.implicits._
    // heavy tie mass: one value holds half the data
    val vals = (1 to 500).map(_ => 10.0) ++ (1 to 500).map(_.toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sorted = vals.sorted
    Seq(1, 250, 500, 750, 1000).foreach { k =>
      val (got, rounds) = DistributedSelect.kthSmallest(df, "v", k,
        buckets = 8, threshold = 4)
      assert(got === sorted(k - 1), s"k=$k")
      assert(rounds < 64, s"k=$k runaway narrowing")
    }
  }
}
