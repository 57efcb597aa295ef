package graft

import graft.functions.{BloomFilter60 => BF}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val m = 4096
  private val k = 3

  private def driverBuild(hs: Seq[Long]): Seq[Long] = {
    val a = new graft.functions.BloomFilter60(m, k)
    hs.foldLeft(a.zero)((b, h) => a.reduce(b, h))
  }

  private def driverProbe(bits: Seq[Long], h: Long): Boolean =
    BF.positions(h, m, k).forall { pos =>
      (bits((pos >> 6).toInt) >> (pos & 63L) & 1L) == 1L
    }

  test("no false negatives, ever; bit array is a pure set function") {
    val s = spark
    import s.implicits._
    val keys = (1L to 600L).map(i => i * 131L)
    val df = keys.toDF("key")
      .select(Dedup.md5Long60(col("key").cast("string")).as("h"))
    val bits = df.agg(BF.agg(m, k, col("h"))).head().getSeq[Long](0)
    // the distributed build equals the driver fold exactly — OR is
    // associative, commutative, idempotent, so partitioning is moot
    val hsDriver = df.collect().map(_.getLong(0)).toSeq
    assert(bits === driverBuild(hsDriver))
    assert(bits === driverBuild(hsDriver.reverse ++ hsDriver),
      "idempotent under replay, order-free")
    // every member probes true — through the driver twin AND the
    // column expression
    assert(hsDriver.forall(driverProbe(bits, _)))
    val colHits = df.select(BF.mightContain(bits, m, k, col("h")))
      .collect().map(_.getBoolean(0))
    assert(colHits.forall(identity))
  }

  test("false-positive rate sits near theory, never at zero here") {
    val s = spark
    import s.implicits._
    val buildHs = (1L to 600L).map(i => i * 131L).toDF("key")
      .select(Dedup.md5Long60(col("key").cast("string")))
      .collect().map(_.getLong(0)).toSeq
    val bits = driverBuild(buildHs)
    // 10k guaranteed non-members (disjoint key space)
    val probes = (1L to 10000L).map(i => -i)
    val probeHs = probes.toDF("key")
      .select(Dedup.md5Long60(col("key").cast("string")).as("h"))
      .collect().map(_.getLong(0))
    val fp = probeHs.count(driverProbe(bits, _))
    // theory: (1 - e^{-kn/m})^k ≈ 1.5% at n=600, m=4096, k=3; the
    // deterministic hash fixes the exact count — assert the envelope
    assert(fp > 0, "m=4096 at n=600 must exhibit SOME false positives")
    assert(fp < 500, s"fpr ${fp / 10000.0} far above theory (~1.5%)")
  }

  test("column probe agrees with the driver twin on every position") {
    val s = spark
    import s.implicits._
    val bits = driverBuild(Seq(7L, 1L << 59, 123456789L,
      (1L << 60) - 1L))
    val hs = Seq(7L, 1L << 59, 123456789L, (1L << 60) - 1L, 8L,
      999999999L, 0L)
    val got = hs.toDF("h")
      .select(col("h"), BF.mightContain(bits, m, k, col("h")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    hs.foreach(h => assert(got(h) === driverProbe(bits, h), s"h=$h"))
    assert(Seq(7L, 1L << 59, 123456789L, (1L << 60) - 1L)
      .forall(got(_)))
  }

  test("bloomGateStream: at-most-once emission per key, replay-safe") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = Dedup.bloomGateStream(
      mem.toDF().toDF("key", "payload"), col("key"),
      mBits = 65536, k = 3) { b =>
      seen ++= b.collect().map(r =>
        (r.getAs[Long]("batch_id"), r.getAs[Long]("key")))
    }
    try {
      // batch 0: 1,2,3 with an in-batch duplicate of 2 → one each
      mem.addData((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      // batch 1: 2 and 3 are standing state; only 4 is new
      mem.addData((2L, "b3"), (3L, "c2"), (4L, "d"))
      q.processAllAvailable()
      // batch 2: a full replay of everything → nothing emits
      mem.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      q.processAllAvailable()
      val byBatch = seen.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      assert(byBatch(0L) === Set(1L, 2L, 3L), seen.toString)
      assert(byBatch(1L) === Set(4L), seen.toString)
      assert(!byBatch.contains(2L), seen.toString)
    } finally q.stop()
  }

  test("bloomGateBatch is pure w.r.t. standing state: failed-sink " +
    "retry re-emits, post-commit replay emits nothing") {
    val s = spark
    import s.implicits._
    val zero = new graft.functions.BloomFilter60(65536, 3).zero
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("key", "payload")
    def keysOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("key").collect().map(_.getLong(0)).sorted.toSeq
    // the probe does NOT fold: re-running the same batch against the
    // same pre-batch state (the retry after a failed sink, which the
    // stream models by committing state only after sink() returns)
    // re-emits the same new keys instead of dropping them forever
    val (n1, f1) = Dedup.bloomGateBatch(b0, col("key"), 65536, 3, zero)
    val (n2, f2) = Dedup.bloomGateBatch(b0, col("key"), 65536, 3, zero)
    assert(keysOf(n1) === Seq(1L, 2L) && keysOf(n2) === Seq(1L, 2L))
    assert(f1 === f2, "the folded filter is a pure function of " +
      "(state, batch)")
    // after the commit point a full replay emits nothing (OR-insert
    // idempotence — the happy-path at-most-once guarantee)
    val (n3, f3) = Dedup.bloomGateBatch(b0, col("key"), 65536, 3, f1)
    assert(keysOf(n3).isEmpty && f3 === f1)
  }

  test("nulls are skipped; empty filter rejects everything") {
    val s = spark
    import s.implicits._
    val bits = (Seq(Option(42L), None, Option(42L), None): Seq[Option[Long]])
      .toDF("h").agg(BF.agg(m, k, col("h"))).head().getSeq[Long](0)
    assert(bits === driverBuild(Seq(42L, 42L)))
    val empty = new graft.functions.BloomFilter60(m, k).zero
    assert(!driverProbe(empty, 42L) && !driverProbe(empty, 0L))
  }
}
