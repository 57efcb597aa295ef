package graft

import graft.pipeline.Bpe
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck differential for BPE merge training: random corpora vs
  * an INDEPENDENT in-memory trainer (token vectors + a greedy
  * leftmost-non-overlapping merge walk — no paren encoding, no
  * string replace), so the paren-string representation and the
  * replace() semantics are checked against an implementation that
  * shares none of their machinery. Each case runs real Spark jobs —
  * small sample count, like EventProperties. */
object BpeProperties extends Properties("graft.bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.spark

  // words over a 3-letter alphabet, lengths 1-6: small enough that
  // random corpora collide into interesting shared-pair structure
  private val genWord: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 12).flatMap { distinct =>
      Gen.listOfN(distinct, Gen.zip(genWord, Gen.choose(1, 5)))
        .map(_.flatMap { case (w, n) => List.fill(n)(w) })
    }

  /** Reference trainer: greedy leftmost non-overlapping merge on
    * symbol VECTORS; tie-break (count desc, lex lhs, lex rhs). */
  private def refTrain(corpus: List[String], rounds: Int)
      : (Seq[(Long, String, String, String, Long)],
         Map[String, Vector[String]]) = {
    val counts = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    var vocab: Map[String, Vector[String]] =
      counts.keys.map(w => w -> w.split("").toVector).toMap
    val merges =
      scala.collection.mutable.Buffer[(Long, String, String, String, Long)]()
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) +
            counts(w)
          case _ => ()
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, rr), c) = pc.toSeq.minBy { case ((a, b), n) =>
          (-n, a, b) }
        merges += ((r.toLong, l, rr, l + rr, c))
        vocab = vocab.view.mapValues { syms =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l &&
                syms(i + 1) == rr) { out += l + rr; i += 2 }
            else { out += syms(i); i += 1 }
          }
          out.result()
        }.toMap
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }

  property("trainMerges and segmentVocab equal the in-memory trainer") =
    Prop.forAll(genCorpus, Gen.choose(1, 5)) { (corpus, rounds) =>
      val s = spark
      import s.implicits._
      val docs = Seq(corpus.mkString(" ")).toDF("text")
      val (wantMerges, wantVocab) = refTrain(corpus, rounds)
      val gotMerges = Bpe.trainMerges(docs, "text", rounds)
        .collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2),
          x.getString(3), x.getLong(4))).toSeq
      val gotSeg = Bpe.segmentVocab(docs, "text", rounds)
        .collect()
        .map(x => x.getString(0) -> x.getString(3).split(" ").toVector)
        .toMap
      Prop(gotMerges == wantMerges) :|
        s"merges: $gotMerges vs $wantMerges" &&
        (Prop(gotSeg == wantVocab) :| s"vocab: $gotSeg vs $wantVocab")
    }
}
