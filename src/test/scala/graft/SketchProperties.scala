package graft

import graft.functions.{BloomFilter60, KllSketch}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the round-12 sketch-family members (KLL
  * ranks, Bloom membership). Pure driver-side: the aggregators'
  * reduce/merge are deterministic JVM code, so the algebra — weight
  * conservation, state bounds, merge-tree invariance, the
  * no-false-negative contract — exercises without a cluster (the
  * Spark encoder paths are covered by KllSketchSpec/BloomFilterSpec).
  */
object SketchProperties extends Properties("graft.sketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40).withMaxDiscardRatio(10)

  private val genVals: Gen[List[Long]] = for {
    n <- Gen.choose(0, 1500)
    vs <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield vs

  property("kll: exact weight, O(k) state, bounded rank error " +
    "under any chunked merge") =
    Prop.forAll(genVals, Gen.choose(1, 7)) { (vs, nc) =>
      val k = 32
      val a = new KllSketch(k)
      def build(s: Seq[Long]) =
        s.foldLeft(a.zero)((b, v) => a.reduce(b, v))
      val grouped =
        if (vs.isEmpty) List(vs)
        else vs.grouped(math.max(1, vs.size / nc)).toList
      val merged = grouped.map(build).reduce(a.merge)
      val n = vs.size.toLong
      val weightOk = KllSketch.totalWeight(merged) == n
      val sizeOk = KllSketch.numRetained(merged) <= 4 * k
      val rankOk = n == 0 || Seq(10L, 500L, 990L).forall { q =>
        val est = KllSketch.quantileOf(merged, q).get
        val target = math.min(n, math.max(1L, (q * n + 999L) / 1000L))
        val lo = vs.count(_ < est).toLong + 1
        val hi = vs.count(_ <= est).toLong
        val err =
          if (target >= lo && target <= hi) 0L
          else math.min(math.abs(target - lo), math.abs(target - hi))
        err <= math.max(2L, 8L * n / k)
      }
      weightOk && sizeOk && rankOk
    }

  property("kll: every quantile is EXACT while n <= k (no compaction" +
    " can have happened, whatever the insert order)") =
    Prop.forAll(Gen.choose(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))) { vs =>
      val a = new KllSketch(32)
      val st = vs.foldLeft(a.zero)((b, v) => a.reduce(b, v))
      Seq(10L, 250L, 500L, 750L, 990L, 1000L).forall { q =>
        val n = vs.size.toLong
        val target = math.min(n, math.max(1L, (q * n + 999L) / 1000L))
        KllSketch.quantileOf(st, q).get ==
          vs.sorted.apply((target - 1).toInt)
      }
    }

  private val genHashes: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    hs <- Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1))
  } yield hs

  private def probe(bits: Seq[Long], h: Long, m: Int, k: Int): Boolean =
    BloomFilter60.positions(h, m, k).forall { pos =>
      (bits((pos >> 6).toInt) >> (pos & 63L) & 1L) == 1L
    }

  property("bloom: chunked merge equals one-shot bit-for-bit; no " +
    "member ever probes false") =
    Prop.forAll(genHashes, Gen.choose(1, 5)) { (hs, nc) =>
      val (m, k) = (1024, 3)
      val a = new BloomFilter60(m, k)
      def build(s: Seq[Long]) =
        s.foldLeft(a.zero)((b, h) => a.reduce(b, h))
      val oneShot = build(hs)
      val grouped =
        if (hs.isEmpty) List(hs)
        else hs.grouped(math.max(1, hs.size / nc)).toList
      val merged = grouped.map(build).reduce(a.merge)
      val replayed = a.merge(merged, merged) // idempotent
      merged == oneShot && replayed == oneShot &&
        hs.forall(probe(oneShot, _, m, k))
    }
}
