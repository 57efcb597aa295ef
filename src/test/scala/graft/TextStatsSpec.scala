package graft

import graft.pipeline.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text")
  }

  test("token counts and ratios") {
    val df = one("the cat the cat runs").select(
      TextStats.tokenCount(col("text")).as("n"),
      TextStats.distinctTokenCount(col("text")).as("nd"),
      TextStats.tokenChars(col("text")).as("tc"),
      TextStats.typeTokenRatio(col("text")).as("ttr"),
      TextStats.stopwordRatio(col("text")).as("sr"))
    val r = df.head()
    assert(r.getAs[Long]("n") === 5)
    assert(r.getAs[Long]("nd") === 3)
    assert(r.getAs[Long]("tc") === 16) // 3+3+3+3+4
    assert(math.abs(r.getAs[Double]("ttr") - 0.6) < 1e-9)
    assert(math.abs(r.getAs[Double]("sr") - 0.4) < 1e-9) // 'the' ×2 of 5
  }

  test("language id heuristic picks the right profile") {
    val cases = Seq(
      "the cat is in the house and a dog" -> "en",
      "el perro es un animal y la casa" -> "es",
      "le chat et la maison est une" -> "fr",
      "der hund und die katze ist ein" -> "de",
      "你好世界你好世界" -> "zh",
      "xyz qqq zzz" -> "und")
    cases.foreach { case (text, want) =>
      val got = one(text).select(TextStats.langId(col("text"))).head().getString(0)
      assert(got === want, s"text: $text")
    }
  }

  test("quality gate: short or repetitive text fails, normal text passes") {
    assert(one("the quick brown fox jumps over a lazy dog near the river bank")
      .select(TextStats.isQuality(col("text"))).head().getBoolean(0))
    assert(!one("short text").select(TextStats.isQuality(col("text")))
      .head().getBoolean(0)) // < 10 tokens
    val repetitive = Seq.fill(50)("spam").mkString(" ")
    assert(!one(repetitive).select(TextStats.isQuality(col("text")))
      .head().getBoolean(0)) // ttr = 1/50
  }

  test("fingerprints match MessageDigest md5") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = "b a c"
    val r = one(text).select(
      TextStats.docFingerprint(col("text")).as("d"),
      TextStats.minTokenFingerprint(col("text")).as("m")).head()
    assert(r.getAs[String]("d") === md5hex(text))
    assert(r.getAs[String]("m") ===
      Seq("a", "b", "c").map(md5hex).min)
  }
}
