package graft

import graft.functions.MinHashUnion
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashUnionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sketch identity: signature of a set union == elementwise-min of signatures") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "g1", "a b c d"),
      (2L, "g1", "c d e f"),
      (3L, "g2", "x y z"))
      .toDF("doc_id", "grp", "text")
    // shingleSize=1 → shingle set == token set, so the group's combined
    // text has exactly the union of the members' shingle sets
    val grouped = docs
      .select(col("grp"),
        Dedup.minhashSignatureNative(col("text"), 16, 1).as("sig"))
      .groupBy("grp").agg(MinHashUnion.agg(16)(col("sig")).as("merged"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Seq("g1" -> "a b c d c d e f", "g2" -> "x y z")
      .toDF("grp", "text")
      .select(col("grp"),
        Dedup.minhashSignatureNative(col("text"), 16, 1).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(grouped === direct)
  }

  test("null signatures ignored; empty group yields null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("g1", Some(Seq(5L, 7L))),
      ("g1", None),
      ("g2", None))
      .toDF("grp", "sig")
    val out = df.groupBy("grp").agg(MinHashUnion.agg(2)(col("sig")).as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out("g1") === Seq(5L, 7L))
    assert(out("g2") === null)
  }
}
