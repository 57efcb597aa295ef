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
}
