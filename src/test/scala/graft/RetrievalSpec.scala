package graft

import graft.pipeline.Retrieval
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25 matches a hand-computed reference and ranks tf over length") {
    val df = docs(
      (1L, "x x y"),       // tf(x)=2, dl=3
      (2L, "x y y y"),     // tf(x)=1, dl=4
      (3L, "z z z"))       // no query term: absent from the result
    val got = Retrieval.bm25TopK(df, "doc_id", "text", Seq("x"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val (n, avgdl, dfx) = (3.0, 10.0 / 3.0, 2.0)
    val idf = math.log(1.0 + (n - dfx + 0.5) / (dfx + 0.5))
    def score(tf: Double, dl: Double) =
      round6(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
    assert(got === Seq(1L -> score(2, 3), 2L -> score(1, 4)))
    assert(got.head._2 > got(1)._2) // higher tf, shorter doc ranks first
  }

  test("bm25: rarer terms outweigh common ones at equal tf") {
    val common = (1L to 8L).map(i => i -> "common filler words here")
    val df = docs(common ++ Seq(
      9L -> "common rare",   // one common + one rare term
      10L -> "common only"): _*)
    val got = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("common", "rare"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 9 carries the rare term: must beat every common-only doc
    assert(got(9L) > got.filter(_._1 != 9L).values.max)
  }

  test("rrf fusion: golden scores, single-list ids retained") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq
    val expected = Seq(
      (2L, round6(1.0 / 62 + 1.0 / 61), 2L), // in both lists
      (1L, round6(1.0 / 61), 1L),
      (3L, round6(1.0 / 62), 1L))
    assert(got === expected)
  }

  test("asRanking assigns dense 1-based ranks by (score desc, id asc)") {
    val s = spark
    import s.implicits._
    val scored = Seq((5L, 0.9), (3L, 0.9), (7L, 0.5)).toDF("id", "sc")
    val got = Retrieval.asRanking(scored, "id", "sc")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(3L -> 1, 5L -> 2, 7L -> 3)) // tie broken by id
  }

  /** Independent in-memory MMR: same micro quantization, same
    * (score desc, id asc) tie-break, plain Scala loops. */
  private def refMmr(vecs: Map[Long, Seq[Double]], q: Seq[Double],
                     k: Int, pool: Int, lam: Long)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def unit(v: Seq[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def relM(a: Seq[Double], b: Seq[Double]): Long =
      BigDecimal(1e6 * a.zip(b).foldLeft(0.0) {
        case (acc, (x, y)) => acc + x * y })
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qn = unit(q)
    val nv = vecs.view.mapValues(unit).toMap
    val cand = nv.map { case (id, v) => (id, relM(v, qn)) }.toSeq
      .sortBy { case (id, r) => (-r, id) }.take(pool)
    var sel = Vector.empty[(Long, Long, Long, Long, Long)]
    (1 to k).foreach { r =>
      val chosen = cand.filterNot(c => sel.exists(_._2 == c._1))
        .map { case (id, rel) =>
          val pen = if (sel.isEmpty) 0L
            else sel.map(s => relM(nv(id), nv(s._2))).max
          (id, rel, pen, lam * rel - (10 - lam) * pen)
        }.minBy { case (id, _, _, sc) => (-sc, id) }
      sel :+= ((r.toLong, chosen._1, chosen._2, chosen._3, chosen._4))
    }
    sel
  }

  test("mmrTopK matches the reference and actually diversifies") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 8
    // a tight cluster near the query plus scattered vectors: pure
    // relevance ranking would fill the list with the cluster; MMR
    // must interleave scattered ids
    val center = Seq.fill(dim)(rnd.nextDouble())
    def near(eps: Double) = center.map(_ + rnd.nextDouble() * eps)
    val rows: Seq[(Long, Seq[Double])] =
      (1L to 8L).map(id => (id, near(0.02))) ++
      (9L to 30L).map(id => (id, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val emb = rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Retrieval.mmrTopK(emb, "vec_id", "embedding", center,
        k = 6, pool = 20, lambda10 = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // float-cast parity: the reference sees the SAME float-rounded
    // vectors the DataFrame carries
    val want = refMmr(
      rows.map { case (id, v) =>
        id -> v.map(x => x.toFloat.toDouble) }.toMap,
      center, k = 6, pool = 20, lam = 5L)
    assert(got === want, s"got\n${got.mkString("\n")}\nwant\n" +
      want.mkString("\n"))
    // diversification: at lambda 0.5 the 6 picks cannot all come from
    // the 8-member near-duplicate cluster
    assert(got.map(_._2).count(_ <= 8L) < 6, got.toString)
    // rank 1 is the pure-relevance argmax
    assert(got.head._1 === 1L && got.head._4 === 0L)
  }

  test("rm3TopK equals BM25 with the hand-derived expanded query") {
    // query "cat": round-1 top-2 = d1, d2 (equal scores, id
    // tie-break → ranks 1, 2). Expansion weights: dog ∈ d1 → 2,
    // fish ∈ d2 → 1, so the m=1 expansion is "dog" — and rm3 must
    // then equal bm25TopK({cat, dog}) verbatim.
    val df = docs(
      (1L, "cat dog"),
      (2L, "cat fish"),
      (3L, "dog bird"))
    val got = Retrieval.rm3TopK(df, "doc_id", "text", Seq("cat"),
        k = 3, feedbackDocs = 2, expansion = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val want = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("cat", "dog"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got === want, s"rm3 $got vs expanded-bm25 $want")
    // d3 holds no original term: only the expansion can retrieve it
    assert(got.map(_._1).contains(3L))
    // original query terms never re-enter as expansion terms: with
    // every feedback doc containing only query terms, the expansion
    // is empty and rm3 degrades to plain BM25
    val pure = docs((1L, "cat cat"), (2L, "cat"), (3L, "bird"))
    val deg = Retrieval.rm3TopK(pure, "doc_id", "text", Seq("cat"),
        k = 3, feedbackDocs = 2, expansion = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val degWant = Retrieval.bm25TopK(pure, "doc_id", "text",
        Seq("cat"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(deg === degWant, s"degenerate rm3 $deg vs bm25 $degWant")
  }
}
