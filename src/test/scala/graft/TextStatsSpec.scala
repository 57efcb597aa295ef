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

  test("pii scrub replaces emails, urls, and digit runs with typed tags") {
    val s2 = spark
    import s2.implicits._
    val out = Seq(
        "mail me at bob.smith+x@corp.example.co or visit " +
          "https://a.example/path?q=1 call 12345678 ok 123456")
      .toDF("text")
      .select(TextStats.scrubPii(col("text")).as("clean"))
      .head().getString(0)
    assert(out === "mail me at <EMAIL> or visit <URL> call <NUM> ok 123456")
  }

  test("chunk windows: stride, overlap, and remainder semantics") {
    val s2 = spark
    import s2.implicits._
    val toks = ('a' to 't').map(_.toString) // 20 tokens
    val rows = Seq(toks.mkString(" ")).toDF("text")
      .select(explode(TextStats.chunkWindows(col("text"), 12, 4)).as("c"))
      .select(col("c.chunk_id"), col("c.chunk_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // ceil((20-4)/8) = 2 chunks at offsets 0 and 8, window 12
    assert(rows.toSeq === Seq(
      0L -> toks.slice(0, 12).mkString(" "),
      1L -> toks.slice(8, 20).mkString(" ")))
    // short doc: one chunk with everything
    val short = Seq("x y z").toDF("text")
      .select(explode(TextStats.chunkWindows(col("text"), 12, 4)).as("c"))
      .select(col("c.chunk_text")).collect().map(_.getString(0))
    assert(short.toSeq === Seq("x y z"))
  }

  test("repeated n-gram fraction: golden values and edge cases") {
    val s2 = spark
    import s2.implicits._
    def rep(text: String, n: Int): Double =
      Seq(text).toDF("text")
        .select(TextStats.repeatedNgramFraction(col("text"), n).as("r"))
        .head().getDouble(0)
    // "aa bb aa bb aa": 2-grams = [aa bb, bb aa, aa bb, bb aa]
    // → 2 distinct of 4 occurrences → half are repeats
    assert(rep("aa bb aa bb aa", 2) === 0.5)
    // fully unique text repeats nothing
    assert(rep("a b c d e", 2) === 0.0)
    // pure spam: "x x x x" 1-grams → 1 distinct of 4 → 0.75
    assert(rep("x x x x", 1) === 0.75)
    // shorter than n: single partial gram, fraction 0
    assert(rep("a b", 5) === 0.0)
  }

  test("unigramLogProb is exact integer-quantized corpus-LM scoring") {
    val s = spark
    import s.implicits._
    // corpus: a→2, b→2, c→1; N=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextStats.unigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(x => (x.getAs[Long]("id"), x.getAs[Long]("ntok"),
        x.getAs[Long]("sum_ll_micro"), x.getAs[Long]("score_micro")))
      .toSeq
    val ll2 = math.round(1e6 * math.log10(2.0)) // 301030
    val llN = math.round(1e6 * math.log10(5.0)) // 698970
    assert(ll2 === 301030L && llN === 698970L)
    // doc1: three tokens of count 2; doc2: one count-2 + one count-1
    val d1 = (3 * ll2, ((3 * ll2 - 3 * llN).toDouble / 3).toLong)
    val d2 = (ll2, ((ll2 - 2 * llN).toDouble / 2).toLong)
    assert(r === Seq((1L, 3L, d1._1, d1._2), (2L, 2L, d2._1, d2._2)))
    // rare tokens score strictly lower than common ones
    assert(r(1)._4 < r(0)._4)
  }

  test("tokenEntropyMicro matches brute force; orders repetition correctly") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      1L -> "a a a a a a",                 // zero entropy: one token type
      2L -> "a b c d e f",                 // max entropy at 6 tokens
      3L -> "spam spam spam spam eggs",    // skewed
      4L -> "the quick brown fox the dog", // mild repetition
      5L -> "x")                           // single token
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextStats.tokenEntropyMicro(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def brute(t: String): Long = {
      val toks = t.split(" ").toSeq
      val n = toks.size.toDouble
      -toks.groupBy(identity).values
        .map(g => math.round(1e6 * (g.size / n) * math.log(g.size / n)))
        .sum
    }
    texts.foreach { case (id, t) =>
      assert(got(id) === brute(t), s"doc $id")
    }
    // golden anchors: uniform-6 = ln 6 nats; constant = 0
    assert(got(1L) === 0L && got(5L) === 0L)
    assert(math.abs(got(2L) - math.round(1e6 * math.log(6.0))) <= 3)
    // entropy orders: uniform > mild repetition > skew > constant
    assert(got(2L) > got(4L) && got(4L) > got(3L) && got(3L) > got(1L))
  }

  test("native token_entropy_micro is bit-identical to the declarative fold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = (0 until 40).map(i => s"v$i")
    val texts = (1L to 300L).map { i =>
      val len = 1 + rnd.nextInt(120)
      i -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (1000L -> "solo")
    val both = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextStats.tokenEntropyMicro(col("text")).as("decl"),
        TextStats.tokenEntropyMicroNative(col("text")).as("nat"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}: declarative ${r.getLong(1)} != " +
          s"native ${r.getLong(2)}")
    }
    // and the SQL registration path evaluates the same kernel
    graft.functions.GraftFunctions.register(s)
    val viaSql = texts.toDF("doc_id", "text")
      .selectExpr("doc_id",
        "token_entropy_micro(split(text, ' ')) AS e")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val decl = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextStats.tokenEntropyMicro(col("text")).as("e"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(viaSql === decl)
  }

  test("bigramLogProb matches the closed-form micro terms") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = TextStats.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // corpus: c1(a)=2, c1(b)=2, c1(c)=2, N=6; c2("a b")=2,
    // c2("b a")=1, c2("c c")=1 — replicate the engine formula exactly
    def term(c2: Long, c1a: Long, c1b: Long): Long =
      math.round(1e6 *
        math.log10(0.75 * c2 / c1a + 0.25 * c1b / 6.0))
    val d1 = 2 * term(2, 2, 2) + term(1, 2, 2) // ab, ab, ba
    val d2 = term(1, 2, 2)                     // cc
    assert(got === Array(
      (1L, 3L, d1, (d1.toDouble / 3).toLong),
      (2L, 1L, d2, d2)))
  }

  test("bigramHoldoutLogProb: train-only model, guarded OOV terms") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // train model: c1(a)=2, c1(b)=1, c1(c)=1, N=4, V=3;
    // bigrams "a b", "b a", "a c" each once
    val hold = Seq((11L, "a b"), (12L, "z a"), (13L, "solo"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramHoldoutLogProb(train, hold,
        "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // replicate the engine's double-op order exactly
    def ll(p: Double): Long = math.round(1e6 * math.log10(p))
    // "a b": seen bigram -> 0.75*1/2 + 0.25*(1+1)/7
    val t11 = ll(0.75 * 1 / 2 + 0.25 * (1 + 1) / 7.0)
    // "z a": w1 unseen -> bigram term 0; back-off 0.25*(2+1)/7
    val t12 = ll(0.25 * (2 + 1) / 7.0)
    assert(got === Array(
      (11L, 1L, 0L, t11, t11),
      (12L, 1L, 1L, t12, t12)), got.mkString("\n"))
    // doc 13 is single-word: no bigram, no row (the d47 semantic)
    assert(!got.exists(_._1 == 13L))
  }

  test("bigramLogProb separates what unigramLogProb cannot") {
    val s = spark
    import s.implicits._
    // same token multiset, different order: repeated-bigram doc vs a
    // shuffle of it — unigram scores are identical by construction,
    // bigram scores must differ (the fluency signal)
    val docs = Seq((1L, "x y x y x y x y"), (2L, "x x y y x y y x"))
      .toDF("doc_id", "text")
    val uni = TextStats.unigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect().map(_.getLong(3))
    assert(uni(0) === uni(1), "unigram model must be order-blind")
    val bi = TextStats.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect().map(_.getLong(3))
    assert(bi(0) !== bi(1), "bigram model must see the order")
    assert(bi(0) > bi(1),
      "the consistent-bigram doc must score as more probable")
  }

  test("pmiCollocations: hand-computed PMI, support floor, ordering") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "c d"), (3L, "a b"))
      .toDF("doc_id", "text")
    // tokens: a=3 b=3 c=1 d=1, Nt=8; bigrams: "a b"×3 "b a"×1 "c d"×1,
    // Nb=5 — the same double-op order as the operator
    def pmi(c2: Long, c1a: Long, c1b: Long): Long =
      math.round(1e6 * math.log(
        (c2.toDouble * 8.0 * 8.0) / (5.0 * c1a.toDouble * c1b.toDouble)))
    val all = TextStats.pmiCollocations(docs, "doc_id", "text",
        minCount = 1, k = 10)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(all.toMap === Map(
      "a b" -> ((3L, 3L, 3L, pmi(3, 3, 3))),
      "b a" -> ((1L, 3L, 3L, pmi(1, 3, 3))),
      "c d" -> ((1L, 1L, 1L, pmi(1, 1, 1)))))
    // ordering: pmi desc, bigram asc — "c d" (rarest unigrams) wins
    assert(all.map(_._1).toSeq === Seq("c d", "a b", "b a"))
    // support floor cuts hapax pairs BEFORE scoring
    val floored = TextStats.pmiCollocations(docs, "doc_id", "text",
      minCount = 2, k = 10).collect().map(_.getString(0))
    assert(floored.toSeq === Seq("a b"))
    // k truncates after the (pmi desc, bigram asc) total order
    val top2 = TextStats.pmiCollocations(docs, "doc_id", "text",
      minCount = 1, k = 2).collect().map(_.getString(0))
    assert(top2.toSeq === Seq("c d", "a b"))
  }

  test("tokenMassGini: uniform, concentrated, and reference cases") {
    val s = spark
    import s.implicits._
    def gini(texts: Seq[String]) = {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextStats.tokenMassGini(df, "doc_id", "text").head()
    }
    def refGini(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      val n = xs.length.toLong
      val num = sorted.zipWithIndex.map { case (x, i) =>
        BigInt(2L * (i + 1) - n - 1) * x }.sum
      (BigInt(1000000) * num / (BigInt(n) * sorted.sum)).toLong
    }
    // all docs the same length: perfectly uniform, gini 0
    val uni = gini(Seq.fill(5)("a b c"))
    assert(uni.getLong(0) === 5L && uni.getLong(1) === 15L &&
      uni.getLong(2) === 0L)
    // one whale among minimal docs: strongly concentrated
    val whale = gini(Seq.fill(9)("x") :+ Seq.fill(91)("w").mkString(" "))
    assert(whale.getLong(2) === refGini(Seq.fill(9)(1L) :+ 91L))
    assert(whale.getLong(2) > 700000L, "whale corpus must score high")
    // random mix matches the closed-form reference exactly
    val rnd = new scala.util.Random(41)
    val lens = Seq.fill(30)(rnd.nextInt(40) + 1)
    val mixed = gini(lens.map(l => Seq.fill(l)("t").mkString(" ")))
    assert(mixed.getLong(2) === refGini(lens.map(_.toLong)))
  }

  test("hashedLinearLogitMicro matches an independent MD5 re-derivation") {
    val s = spark
    import s.implicits._
    // independent reference: JVM MessageDigest, not Spark's md5 —
    // re-derives md5Long60 + bucket + weight lookup from scratch
    def h60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val dim = 64
    val w = (0 until dim).map(j => (j * 37L % 41L) - 20L)
    val bias = 7L
    def refLogit(text: String): Long = {
      val toks = text.split(" ", -1).toSeq
      val feats = toks ++ toks.zip(toks.drop(1))
        .map { case (a, b) => s"${a}_$b" }
      bias + feats.map(f => w((h60(f) % dim).toInt)).sum
    }
    val texts = Seq("good day", "one", "the quick brown fox",
      "dup dup dup", "")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.pipeline.TextStats
        .hashedLinearLogitMicro(col("text"), w, bias).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === refLogit(t), s"text '$t'")
    }
    // one-token text contributes exactly one unigram, no bogus bigram
    assert(got(1L) === bias + w((h60("one") % dim).toInt))
  }

  test("tokenMassTheil: hand-computed micro terms and the zero case") {
    val s = spark
    import s.implicits._
    def run(texts: Seq[String]) =
      TextStats.tokenMassTheil(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text").head()
    // token masses 1 and 3: μ=2, terms (0.5·ln0.5, 1.5·ln1.5) →
    // micro −346574 + 608198 = 261624; T_micro = 261624/2 = 130812
    val t = run(Seq("a", "a b c"))
    assert(t.getLong(0) === 2L && t.getLong(1) === 4L)
    assert(t.getLong(2) === 130812L, s"theil: $t")
    // perfectly equal masses → ratio 1, ln 1 = 0 → T = 0
    val eq = run(Seq("a b", "c d", "e f"))
    assert(eq.getLong(2) === 0L)
    // a whale dominates: T strictly grows with concentration
    val whale = run(Seq("a", "a", String.valueOf("w " * 49).trim))
    assert(whale.getLong(2) > t.getLong(2), s"whale: $whale")
    // empty corpus: EMPTY report, mirroring the oracle's empty
    // GROUP BY (round-11 review)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.tokenMassTheil(empty, "doc_id", "text")
      .count() === 0L)
    assert(TextStats.tokenMassTheilDecomposition(
      Seq.empty[(Long, String, String)].toDF("doc_id", "src", "text"),
      "doc_id", "text", "src").count() === 0L)
  }

  test("tokenMassTheilDecomposition: hand terms and the identity") {
    val s = spark
    import s.implicits._
    def run(rows: Seq[(String, String)]) =
      TextStats.tokenMassTheilDecomposition(
        rows.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
          .toDF("doc_id", "src", "text"),
        "doc_id", "text", "src").head()
    // A=[1,3], B=[2,2]: between = 0 (both sources hold their fair
    // share), within = total = −86643 + 152049 = 65406
    val bal = run(Seq("A" -> "a", "A" -> "a b c",
      "B" -> "x y", "B" -> "p q"))
    assert(bal.getLong(0) === 4L && bal.getLong(1) === 8L &&
      bal.getLong(2) === 2L)
    assert(bal.getLong(4) === 0L, s"between: $bal")
    assert(bal.getLong(3) === 65406L &&
      bal.getLong(5) === 65406L, s"decomp: $bal")
    // A=[4] vs B=[1,1,1,1]: ALL inequality is between sources
    // (within = 0); identity holds to per-term rounding slack
    val skew = run(Seq("A" -> "w w w w", "B" -> "a", "B" -> "b",
      "B" -> "c", "B" -> "d"))
    assert(skew.getLong(5) === 0L, s"within: $skew")
    assert(skew.getLong(4) === 223143L, s"between: $skew")
    val slack = math.abs(skew.getLong(3) -
      (skew.getLong(4) + skew.getLong(5)))
    assert(slack <= skew.getLong(0) + skew.getLong(2),
      s"identity slack $slack: $skew")
  }
}
