package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = (1 to 30).map(i => s"w$i")
    ((1L to 50L).map { id =>
      (id, Seq.fill(5 + rnd.nextInt(60))(vocab(rnd.nextInt(30))).mkString(" "))
    } ++ Seq((100L, "short"), (101L, "a b"))) // fewer tokens than shingle size
      .toDF("doc_id", "text")
  }

  test("native expression equals the declarative signature bit-for-bit") {
    val both = docs.select(col("doc_id"),
      Dedup.minhashSignatureNative(col("text"), 32, 3).as("native"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32)
        .as("declarative"))
    val bad = both.filter(col("native") =!= col("declarative")).count()
    assert(bad === 0)
    // and non-degenerate: different docs get different signatures
    assert(both.select(col("native")).distinct().count() > 40)
  }

  test("native and declarative candidate pairs agree") {
    val a = Dedup.minhashCandidatePairs(docs, "doc_id", "text", native = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.minhashCandidatePairs(docs, "doc_id", "text", native = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("registered function is usable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = docs
      .select(col("doc_id"), expr("minhash_sig(split(text, ' '), 32, 3)")
        .as("sig"))
    val viaApi = docs.select(col("doc_id"),
      Dedup.minhashSignatureNative(col("text"), 32, 3).as("sig"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("null tokens and null input handled") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq(Some("a"), None, Some("b")))),
      (2L, None: Option[Seq[Option[String]]]))
      .toDF("id", "toks")
    val out = df.select(org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashSig(
        org.apache.spark.sql.GraftBridge.expression(col("toks")), 4, 2))
      .as("sig")).collect()
    assert(out(0).getSeq[Long](0).length === 4)
    assert(out(1).isNullAt(0))
  }
}
