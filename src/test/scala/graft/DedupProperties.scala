package graft

import graft.pipeline.{Classify, Dedup}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck differentials for the exactness-claiming dedup/classify
  * operators: random inputs vs brute-force / independent references.
  * Each case runs real Spark jobs — small sample counts. */
object DedupProperties extends Properties("graft.dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.spark

  // clustered 60-bit fingerprints: a few random centers, each with
  // noisy satellites a few bit-flips away — guarantees in-range pairs
  // that a uniform generator would almost never produce
  private val genHashes: Gen[List[Long]] = for {
    nCenters <- Gen.choose(1, 4)
    centers <- Gen.listOfN(nCenters,
      Gen.choose(Long.MinValue, Long.MaxValue).map(_ & ((1L << 60) - 1)))
    sats <- Gen.listOfN(12, for {
      c <- Gen.oneOf(centers)
      flips <- Gen.choose(0, 6)
      bits <- Gen.listOfN(flips, Gen.choose(0, 59))
    } yield bits.foldLeft(c)((h, b) => h ^ (1L << b)))
  } yield centers ++ sats

  property("bandedHammingPairs equals brute force at every legal " +
    "(bands, maxDist)") =
    Prop.forAll(genHashes, Gen.oneOf(2, 3, 4, 5, 6)) { (hs, bands) =>
      val s = spark
      import s.implicits._
      val maxDist = bands - 1
      val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val want = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (ia, ib, d.toLong)).toSet
      val got = Dedup.bandedHammingPairs(rows.toDF("id", "h"),
          "id", "h", bits = 60, bands = bands, maxDist = maxDist)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Prop(got == want) :| s"bands=$bands got=$got want=$want"
    }

  private val genLabeledDocs: Gen[List[(Long, String, String)]] = for {
    nLabels <- Gen.choose(2, 3)
    labels = List("p", "q", "r").take(nLabels)
    n <- Gen.choose(nLabels, 10)
    docs <- Gen.sequence[List[(String, String)], (String, String)](
      (0 until n).toList.map { i =>
        for {
          lab <- if (i < nLabels) Gen.const(labels(i))
                 else Gen.oneOf(labels) // every label gets >= 1 doc
          len <- Gen.choose(1, 5)
          toks <- Gen.listOfN(len, Gen.oneOf("u", "v", "w", "x"))
        } yield (toks.mkString(" "), lab)
      })
  } yield docs.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }

  /** Independent NB reference (the ClassifySpec arithmetic). */
  private def refConfusion(docs: List[(Long, String, String)])
      : Map[(String, String), Long] = {
    def rm(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val toks = docs.flatMap { case (_, t, l) =>
      t.split(" ", -1).map(l -> _) }
    val classTok = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val docCnt = docs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val vocab = toks.map(_._2).distinct.size.toLong
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val labels = classTok.keys.toSeq.sorted
    docs.map { case (_, t, lab) =>
      val best = labels.map { l =>
        val prior = rm(math.log(docCnt(l).toDouble / docs.size))
        val terms = t.split(" ", -1).map(tok => rm(math.log(
          (counts.getOrElse((l, tok), 0L) + 1).toDouble /
            (classTok(l) + vocab).toDouble))).sum
        (-(prior + terms), l)
      }.min
      (lab, best._2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  property("nbSelfConfusion equals the in-memory NB on random corpora") =
    Prop.forAll(genLabeledDocs) { docs =>
      val s = spark
      import s.implicits._
      val got = Classify.nbSelfConfusion(
          docs.toDF("doc_id", "text", "lang"),
          "doc_id", "text", "lang")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val want = refConfusion(docs)
      Prop(got == want) :| s"got=$got want=$want"
    }
}
