package graft

import graft.functions.{KllSketch, KllState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KllSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def build(k: Int, vs: Seq[Long]): KllState = {
    val a = new KllSketch(k)
    vs.foldLeft(a.zero)((b, v) => a.reduce(b, v))
  }

  /** Deterministic scramble: Knuth multiplicative-hash order (no
    * rand() anywhere — the hashSample discipline applies to fixtures
    * too). */
  private def scrambled(vs: Seq[Long]): Seq[Long] =
    vs.zipWithIndex
      .sortBy { case (_, i) => (i + 1) * 2654435761L % 1000003L }
      .map(_._1)

  /** Rank error of the sketch's q-permille estimate against the true
    * multiset: 0 if ⌈q·n/1000⌉ falls inside the estimate's exact rank
    * interval [count(<v)+1, count(≤v)], else the distance to it. */
  private def rankErr(vs: Seq[Long], s: KllState, q: Long): Long = {
    val est = KllSketch.quantileOf(s, q).get
    val n = vs.length.toLong
    val target = math.min(n, math.max(1L, (q * n + 999L) / 1000L))
    val lo = vs.count(_ < est).toLong + 1L
    val hi = vs.count(_ <= est).toLong
    if (target >= lo && target <= hi) 0L
    else math.min(math.abs(target - lo), math.abs(target - hi))
  }

  private val qs = Seq(10L, 50L, 100L, 250L, 500L, 750L, 900L, 990L)

  test("exact below capacity; weight and retention accounting") {
    val vs = (1L to 50L).map(i => i * 7L)
    val s = build(64, scrambled(vs))
    assert(KllSketch.totalWeight(s) === 50L)
    assert(KllSketch.numRetained(s) === 50)
    // nothing was ever compacted: every quantile is exact
    qs.foreach(q => assert(rankErr(vs, s, q) === 0L, s"q=$q"))
    assert(KllSketch.quantileOf(s, 500L).get === 25L * 7L)
    assert(KllSketch.quantileOf(s, 1000L).get === 350L)
    assert(KllSketch.quantileOf(KllState(Seq(Vector.empty),
      Seq(0L)), 500L).isEmpty)
  }

  test("rank-error bound over uniform, skewed, and tied data") {
    val k = 128
    val n = 20000
    val shapes = Map(
      "uniform" -> (1 to n).map(_.toLong),
      "skewed" -> (1 to n).map(i => i.toLong * i),
      "ties" -> (1 to n).map(i => (i / 100).toLong))
    shapes.foreach { case (name, vs) =>
      val s = build(k, scrambled(vs))
      assert(KllSketch.totalWeight(s) === n.toLong, name)
      // O(k) state regardless of n: Σ k·(2/3)^i = 3k plus per-level
      // ceil slack
      assert(KllSketch.numRetained(s) <= 4 * k, name)
      val worst = qs.map(rankErr(vs, s, _)).max
      info(s"$name: worst rank err $worst of n=$n (bound ${4 * n / k})")
      assert(worst <= 4L * n / k, s"$name: err $worst > ${4 * n / k}")
    }
  }

  test("merge: any merge tree conserves weight and keeps the bound") {
    val k = 128
    val n = 20000
    val vs = (1 to n).map(i => i.toLong * 3L)
    val chunks = scrambled(vs).grouped(n / 4 + 1).toVector
      .map(build(k, _))
    val seqMerge = chunks.reduceLeft(KllSketch.mergeStates(_, _, k))
    val treeMerge = KllSketch.mergeStates(
      KllSketch.mergeStates(chunks(0), chunks(1), k),
      KllSketch.mergeStates(chunks(2), chunks(3), k), k)
    Seq("seq" -> seqMerge, "tree" -> treeMerge).foreach {
      case (name, s) =>
        assert(KllSketch.totalWeight(s) === n.toLong, name)
        val worst = qs.map(rankErr(vs, s, _)).max
        info(s"$name merge: worst rank err $worst (bound ${4 * n / k})")
        assert(worst <= 4L * n / k, s"$name: $worst")
    }
    // merge is a pure function of its inputs
    assert(KllSketch.mergeStates(chunks(0), chunks(1), k) ===
      KllSketch.mergeStates(chunks(0), chunks(1), k))
  }

  test("deterministic: identical insert order, identical state") {
    val vs = scrambled((1L to 5000L).map(i => i % 977L))
    assert(build(64, vs) === build(64, vs))
  }

  test("Spark aggregation path: encoder round-trip, nulls skipped") {
    val s = spark
    import s.implicits._
    // n ≤ k: no compaction can happen under ANY partition order, so
    // the distributed sketch is exact despite nondeterministic merges
    val df = ((1 to 100).map(i => Some(i.toLong * 11L)) :+
      Option.empty[Long] :+ Option.empty[Long]).toDF("v")
    val st = KllSketch.fromRow(
      df.agg(KllSketch.agg(128, col("v"))).head().getStruct(0))
    assert(KllSketch.totalWeight(st) === 100L)
    assert(KllSketch.quantileOf(st, 500L).get === 50L * 11L)
    assert(KllSketch.quantileOf(st, 10L).get === 11L)
  }

  // ---- weighted inserts (q110) ----------------------------------

  private def buildW(k: Int, vws: Seq[(Long, Long)]): KllState = {
    val a = new graft.functions.KllSketchWeighted(k)
    vws.foldLeft(a.zero)((b, vw) =>
      a.reduce(b, graft.functions.KllWeightedIn(vw._1, vw._2)))
  }

  test("weighted insert: weight conserved exactly, w=1 degenerates " +
    "to the unweighted sketch, below-capacity exactness") {
    // below capacity with total weight counted in WEIGHT units:
    // 10 items of weights 1..10 — Σw = 55, all items retained
    val vws = (1L to 10L).map(i => (i * 100L, i))
    val s = buildW(64, vws)
    assert(KllSketch.totalWeight(s) === 55L)
    // weighted median: target ⌈0.5·55⌉ = 28, cum weight crosses at
    // v=700 (1+..+6=21 < 28 ≤ 28=1+..+7)
    assert(KllSketch.quantileOf(s, 500L).get === 700L)
    // w = 1 inserts ≡ the unweighted aggregator, state for state
    val vs = scrambled((1L to 3000L).map(i => i % 613L))
    assert(buildW(128, vs.map(v => (v, 1L))) === build(128, vs))
  }

  test("weighted insert: binary decomposition matches w repeated " +
    "unit inserts in WEIGHT (rank envelope over a skewed corpus)") {
    val k = 128
    // token-weighted shape: value = length bucket, weight = tokens
    // (heavy tail: a few huge docs dominate the weight mass)
    val vws = scrambled((1L to 4000L)).map { i =>
      val w = if (i % 97L == 0L) 500L + (i % 13L) else 1L + (i % 7L)
      (i, w)
    }
    val s = buildW(k, vws)
    val totW = vws.map(_._2).sum
    assert(KllSketch.totalWeight(s) === totW)
    assert(KllSketch.numRetained(s) <= 4 * k)
    // weighted rank error within the entries' 8W/k acceptance bound
    val sorted = vws.sortBy(_._1)
    qs.foreach { q =>
      val est = KllSketch.quantileOf(s, q).get
      val target = math.min(totW, math.max(1L, (q * totW + 999L) / 1000L))
      val lo = sorted.filter(_._1 < est).map(_._2).sum + 1L
      val hi = sorted.filter(_._1 <= est).map(_._2).sum
      val err = if (target >= lo && target <= hi) 0L
        else math.min(math.abs(target - lo), math.abs(target - hi))
      assert(err <= 8L * totW / k, s"q=$q est=$est err=$err")
    }
  }

  test("weighted Spark aggregation path: null value, null weight, " +
    "and non-positive weight rows all skip; merge conserves Σw") {
    val s = spark
    import s.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(10L), Some(3L)), (Some(20L), Some(5L)),
      (Some(30L), Some(0L)), // zero weight: skipped
      (Some(40L), Some(-2L)), // negative: skipped
      (None, Some(9L)), (Some(50L), None))
      .toDF("v", "w")
    val st = KllSketch.fromRow(
      df.agg(KllSketch.aggWeighted(64, col("v"), col("w")))
        .head().getStruct(0))
    assert(KllSketch.totalWeight(st) === 8L)
    assert(KllSketch.quantileOf(st, 500L).get === 20L)
    // grouped partials + driver merge conserve weight exactly
    val big = (1L to 2000L).map(i => (i, 1L + i % 11L)).toDF("v", "w")
    val parts = big.groupBy(pmod(col("v"), lit(4L)).as("b"))
      .agg(KllSketch.aggWeighted(64, col("v"), col("w")).as("sk"))
      .orderBy("b").collect()
      .map(r => KllSketch.fromRow(r.getStruct(1)))
    val merged = parts.reduceLeft(KllSketch.mergeStates(_, _, 64))
    assert(KllSketch.totalWeight(merged) ===
      (1L to 2000L).map(i => 1L + i % 11L).sum)
  }
}
