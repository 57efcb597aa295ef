package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("split assignment is deterministic and corpus-independent") {
    val s = spark
    import s.implicits._
    val full = (0L until 1000L).toDF("doc_id")
      .withColumn("split", Curation.splitName(col("doc_id")))
    val counts = full.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    // hash-uniform: 90/5/5 within generous tolerance at n=1000
    assert(counts("train") > 850 && counts("train") < 950)
    assert(counts("val") > 20 && counts("val") < 90)
    assert(counts("test") > 20 && counts("test") < 90)
    // a doc's split does not depend on what else is in the corpus
    val subset = (0L until 100L).toDF("doc_id")
      .withColumn("split", Curation.splitName(col("doc_id")))
    val fullMap = full.filter(col("doc_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.collect().foreach { r =>
      assert(fullMap(r.getLong(0)) === r.getString(1))
    }
  }

  test("group-aware splits: no cluster spans splits; singletons match per-doc splits") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    // clusters {0..4} and {10,11}; everything else singleton
    val comp = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (10L, 10L), (11L, 10L)).toDF("id", "component")
    val got = Curation.assignSplitsByGroup(docs, "doc_id", comp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the no-leakage invariant: cluster members share one split
    assert(Set(0L, 1L, 2L, 3L, 4L).map(got).size === 1)
    assert(Set(10L, 11L).map(got).size === 1)
    // a clustered doc keys on its component, so its split equals the
    // REPRESENTATIVE's per-id split
    assert(got(3L) ===
      docs.filter(col("doc_id") === 0)
        .withColumn("split", Curation.splitName(col("doc_id")))
        .head().getString(1))
    // singletons (no component row) key on their own id — identical
    // to the per-doc policy, so incremental ingestion stays stable
    val perDoc = Curation.assignSplits(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (12L until 200L).foreach(i => assert(got(i) === perDoc(i)))
  }

  test("stratified sample takes exactly n per stratum, stable under repartition") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val sampled = Curation.stratifiedSample(df, col("lang"), col("doc_id"), 7)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("a" -> 7L, "b" -> 7L))
    val again = Curation.stratifiedSample(
      df.repartition(7), col("lang"), col("doc_id"), 7)
    assert(sampled.select("lang", "doc_id").collect().toSet ===
      again.select("lang", "doc_id").collect().toSet)
  }

  test("wordNgrams: sliding windows; shorter-than-n docs yield empty") {
    val r = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"), Curation.wordNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(r(1L) === Seq("a b c", "b c d"))
    assert(r(2L) === Seq.empty)
  }

  test("contamination finds planted n-gram overlap and nothing else") {
    val shared = "one two three four five six seven eight"
    val corpus = docs(
      (10L, s"prefix $shared suffix tokens here"),
      (11L, "totally different words with no overlap at all whatsoever"))
    val bench = docs((99L, s"benchmark leading text $shared trailing"))
    val hits = Curation.contamination(corpus, bench, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(10L) && !hits.contains(11L))
    assert(hits(10L) === 1L) // exactly the planted 8-gram
  }

  test("tfidf ranks in-doc-frequent, corpus-rare terms first") {
    val corpus = docs(
      (1L, "apple apple apple banana"),
      (2L, "banana cherry banana dates"),
      (3L, "banana cherry cherry cherry"))
    val top = Curation.tfidfTopTerms(corpus, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple tf 3/4 beats everything; doc 2: banana's tf edge
    // (2/4 × idf 1.0 = 0.5) outweighs rarer dates (1/4 × 1.693);
    // doc 3: cherry tf 3/4 × idf 1.288 dominates
    assert(top === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // ranking is on the rounded score with term-asc tie-break:
    // equal-tf equal-df terms order alphabetically
    val tie = Curation.tfidfTopTerms(docs((7L, "zebra yak")), k = 2)
      .orderBy("term_rank")
      .collect().map(_.getString(1)).toSeq
    assert(tie === Seq("yak", "zebra"))
  }

  test("mixture report shares sum to 1") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("s1", "en", "a b c"), ("s1", "fr", "d e"), ("s2", "en", "f"))
      .toDF("source", "lang", "text")
    val rep = Curation.mixtureReport(df).collect()
    assert(rep.map(_.getAs[Long]("tokens")).sum === 6L)
    assert(math.abs(rep.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-6)
  }

  test("contamination runs streaming: stream-static join + update-mode agg") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val shared = "one two three four five six seven eight"
    val bench = docs((99L, s"bench context $shared more context"))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = Curation.contamination(stream, bench, n = 8)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("update").start()
    try {
      mem.addData((1L, s"clean document with nothing shared here at all"))
      mem.addData((2L, s"copied $shared verbatim"))
      out.processAllAvailable()
      val rows = s.sql("SELECT * FROM contam_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows === Map(2L -> 1L))
    } finally out.stop()
  }

  test("trainOrder is the reproducible global hash order") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).toDF("doc_id")
    val ordered = Curation.trainOrder(df, col("doc_id"), partitions = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = df
      .withColumn("k", graft.pipeline.Dedup.md5Long60(
        col("doc_id").cast("string")))
      .orderBy("k", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ordered === expected)
    assert(ordered !== (0L until 100L).toSeq) // actually shuffled
  }

  test("sequence packing: greedy boundary bins per shard, golden values") {
    val s = spark
    import s.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // one shard (ids all ≡ 1 mod 8): token counts 300, 300, 100
    // starts 0, 300, 600 under seqTokens=512 → seqs 0, 0, 1
    val df = Seq(
      (1L, words(300)), (9L, words(300)), (17L, words(100)),
      (2L, words(600))) // second shard: starts at 0, spans seq 0→1
      .toDF("doc_id", "text")
    val got = graft.pipeline.Curation
      .packSequences(df, "doc_id", "text", seqTokens = 512, shards = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(9L) === ((1L, 0L, 300L)))
    assert(got(17L) === ((1L, 1L, 88L))) // 600 = 512 + 88
    assert(got(2L) === ((2L, 0L, 0L)))  // own shard, fresh count
  }

  private def srcDocs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  /** Scala replay of Dedup.md5Long60 for the sampling decision. */
  private def md5Long60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("hash sample: deterministic, rate-proportional, nested thresholds") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    def ids(rate: Double) = Curation.hashSample(df, col("doc_id"), rate)
      .collect().map(_.getLong(0)).toSet
    val at10 = ids(0.1)
    assert(ids(0.1) === at10) // deterministic run-to-run
    assert(at10.size > 140 && at10.size < 260) // ~10% of 2000
    // nested: a finer sample is a subset of a coarser one
    assert(ids(0.05).subsetOf(at10))
    assert(ids(0.0) === Set.empty && ids(1.0).size === 2000)
  }

  test("temperature sampling: T=1 keeps everything, T>1 thins the dominant source") {
    val rows = (1L to 80L).map(i => (i, "big", "w1 w2 w3 w4 w5")) ++
      (81L to 90L).map(i => (i, "rare", "w1 w2 w3 w4 w5"))
    val df = srcDocs(rows: _*)
    val t1 = Curation.temperatureSample(df, "source", "doc_id", "text", 1.0)
    assert(t1.count() === 90L) // pow(p, 0) = 1 for every group
    val t2 = Curation.temperatureSample(df, "source", "doc_id", "text", 2.0)
      .select("doc_id", "source", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val rateBySrc = t2.map(r => r._2 -> r._3).toMap
    assert(rateBySrc("rare") === 1.0) // rarest group keeps everything
    assert(rateBySrc.getOrElse("big", 1.0) < 1.0 || !rateBySrc.contains("big"))
    assert(t2.count(_._2 == "rare") === 10)
    // the kept set is exactly the portable-hash threshold decision:
    // rate = round((p_big)^(-1/2) / (p_rare)^(-1/2), 6) = round(sqrt(1/8), 6)
    val expectedRate = BigDecimal(math.sqrt(10.0 / 80.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bigKept = t2.filter(_._2 == "big").map(_._1).toSet
    val expectKept = (1L to 80L).filter(i =>
      md5Long60(i.toString) % 1000000L <
        math.round(expectedRate * 1000000)).toSet
    assert(bigKept === expectKept)
    // deterministic: a second run yields the identical kept set
    val again = Curation.temperatureSample(df, "source", "doc_id", "text",
        2.0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === t2.map(_._1).toSet)
  }

  test("poisson bootstrap: exact weight replay; means bracket the truth") {
    val s = spark
    import s.implicits._
    val n = 1000
    val df = (0 until n).map(i => (i.toLong, (i % 100).toLong))
      .toDF("doc_id", "v")
    val got = Curation.poissonBootstrapMeans(df, col("doc_id"), col("v"),
        replicates = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === (0L until 8L))
    // exact replay of replicate 0 in plain Scala
    def weight(id: Long, b: Long): Long = {
      val u = md5Long60(s"$id|$b") % 1000000L
      Curation.PoissonCdfMicro.count(u >= _)
    }
    val w0 = (0 until n).map(i => weight(i.toLong, 0L))
    val expMean = w0.zipWithIndex.map { case (w, i) => w.toLong * (i % 100) }
      .sum.toDouble / w0.sum
    val r0 = got.find(_._1 == 0L).get
    assert(r0._2 === w0.sum.toLong)
    assert(r0._3 === BigDecimal(expMean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // n_eff ~ Poisson(n): all replicates within 4 sigma of n
    got.foreach { case (_, ne, _) =>
      assert(math.abs(ne - n) < 4 * math.sqrt(n.toDouble), s"n_eff $ne")
    }
    // the replicate means cluster around the true mean (49.5) with
    // sd ~ sd(v)/sqrt(n) ~ 0.91 — allow 5 sigma
    val trueMean = (0 until n).map(_ % 100).sum.toDouble / n
    got.foreach { case (b, _, m) =>
      assert(math.abs(m - trueMean) < 5.0, s"replicate $b mean $m")
    }
  }

  test("poisson bootstrap: all-zero-weight replicate yields explicit null mean") {
    val s = spark
    import s.implicits._
    // hunt a (tiny input, replicate) pair whose hash-Poisson weights
    // are all zero — guaranteed findable fast since P(w=0) ≈ 0.368 per
    // row — then check the guarded mean is null, not NaN/divide noise
    def weight(id: Long, b: Long): Long = {
      val u = md5Long60(s"$id|$b") % 1000000L
      Curation.PoissonCdfMicro.count(u >= _)
    }
    val ids = Seq(3L, 17L)
    val deadReplicate = (0 until 64)
      .find(b => ids.forall(weight(_, b.toLong) == 0L))
    assert(deadReplicate.isDefined, "no all-zero replicate in 64 draws")
    val df = ids.map(i => (i, 10L)).toDF("doc_id", "v")
    val got = Curation.poissonBootstrapMeans(df, col("doc_id"), col("v"),
        replicates = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val dead = got.find(_._1 == deadReplicate.get.toLong).get
    assert(dead._2 === 0L)
    assert(dead._3.isEmpty, s"expected null mean, got ${dead._3}")
    // sanity: live replicates still produce finite means
    assert(got.filter(_._2 > 0).forall(_._3.exists(m => !m.isNaN)))
  }

  test("weighted reservoir: exact A-ES replay, weight bias, zero-weight exclusion") {
    val s = spark
    import s.implicits._
    val n = 2000
    // weights 1..5 cycling; a handful of zero/negative weights must
    // never be sampled regardless of their hash draw
    val df = (0 until n).map(i =>
        (i.toLong, if (i % 400 == 0) 0L else (i % 5 + 1).toLong))
      .toDF("doc_id", "w")
    val got = Curation.weightedReservoir(df, col("doc_id"), col("w"), 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 200)
    // exact replay: priority = round(u^(1/w) * 1e9) with
    // u = (md5Long60(id) mod 1e6 + 0.5)/1e6, top-k by (priority desc,
    // id asc)
    val replay = (0 until n).map { i =>
      val w = if (i % 400 == 0) 0L else (i % 5 + 1).toLong
      val u = (md5Long60(i.toString) % 1000000L + 0.5) / 1000000.0
      (i.toLong, w, math.round(math.pow(u, 1.0 / w) * 1e9))
    }.filter(_._2 > 0)
      .sortBy { case (id, _, p) => (-p, id) }.take(200)
    assert(got.toSeq === replay)
    assert(got.forall(_._2 > 0))
    // weight bias: mean weight in the sample exceeds the population's
    // (uniform over 1..5 => 3.0); A-ES with these weights should pull
    // the sample mean well above it
    val meanW = got.map(_._2).sum.toDouble / got.length
    assert(meanW > 3.3, s"sample mean weight $meanW not biased upward")
    // the k-bounded plan: TakeOrdered, not a global Sort+Limit
    val plan = Curation.weightedReservoir(df, col("doc_id"), col("w"), 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("corpusDiff classifies added/removed/changed/unchanged exactly") {
    val s = spark
    import s.implicits._
    val old_ = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "a"), (2L, "B"), (5L, "e"))
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(old_, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "removed", 5L -> "added"))
  }

  test("weighted stratified sample: per-stratum A-ES replay") {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map { i =>
      (i.toLong, s"s${i % 3}", if (i % 50 == 0) 0L else (i % 7 + 1).toLong)
    }
    val df = rows.toDF("doc_id", "stratum", "w")
    val got = Curation.weightedStratifiedSample(df, col("stratum"),
        col("doc_id"), col("w"), n = 10)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(4)))
    // exact replay per stratum
    val byStratum = rows.filter(_._3 > 0).groupBy(_._2)
    val want = byStratum.flatMap { case (st, rs) =>
      rs.map { case (id, _, w) =>
        val u = (md5Long60(id.toString) % 1000000L + 0.5) / 1000000.0
        (st, id, math.round(math.pow(u, 1.0 / w) * 1e9))
      }.sortBy { case (_, id, p) => (-p, id) }.take(10).zipWithIndex
        .map { case ((st2, id, _), k) => (st2, id, k + 1) }
    }.toSet
    assert(got.toSet === want)
    // every stratum filled to n; zero-weight rows never sampled
    assert(got.groupBy(_._1).forall(_._2.length == 10))
    assert(!got.exists { case (_, id, _) => id % 50 == 0 })
  }

  test("weighted reservoir: large weights keep distinct priorities") {
    val s = spark
    import s.implicits._
    // weights in the thousands compress u^(1/w) into [exp(-14.5/w), 1);
    // at the old 1e6 quantum that left ~2900 distinct values and huge
    // tie groups broken by ascending id (a low-id-skewed sample); the
    // 1e9 quantum must keep the sample essentially tie-free and NOT
    // dominated by low ids
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, 5000L + (i % 7)))
      .toDF("doc_id", "w")
    val got = Curation.weightedReservoir(df, col("doc_id"), col("w"), 200)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length === 200)
    val distinctPriorities = got.map(_._2).distinct.length
    assert(distinctPriorities >= 190,
      s"only $distinctPriorities distinct priorities in a 200-sample")
    // near-equal weights => the sample should look uniform over ids,
    // not a low-id prefix: the mean sampled id sits near n/2
    val meanId = got.map(_._1).sum.toDouble / got.length
    assert(meanId > n * 0.35 && meanId < n * 0.65,
      s"sample id mean $meanId skewed — tie-break leakage")
  }

  test("strideMixtureOrder: every prefix is the corpus mixture") {
    val s = spark
    import s.implicits._
    // sources of size 30 and 10: a 3:1 mixture
    val rows = (1L to 30L).map(i => (i, "big")) ++
      (41L to 50L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "source")
    val ordered = Curation.strideMixtureOrder(df, "doc_id", "source")
      .orderBy("vt_micro", "source", "doc_id")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(ordered.length === 40)
    // proportionality: any prefix of length 4k holds ~3k big / k small
    // (stride guarantees within-one-of-proportional at every point)
    Seq(4, 8, 20, 40).foreach { n =>
      val smallN = ordered.take(n).count(_._2 == "small")
      val expect = n / 4.0
      assert(math.abs(smallN - expect) <= 1.0,
        s"prefix $n: $smallN small docs, expected ~$expect")
    }
    // determinism: a second run reproduces the schedule exactly
    val again = Curation.strideMixtureOrder(df, "doc_id", "source")
      .orderBy("vt_micro", "source", "doc_id")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(ordered.toSeq === again.toSeq)
    // within-source order is the md5 shuffle, not id order
    val bigIds = ordered.filter(_._2 == "big").map(_._1).toSeq
    assert(bigIds !== bigIds.sorted, "expected hash-shuffled order")
  }

  test("serpentineShards matches the naive window form and balances") {
    val s = spark
    import s.implicits._
    // heavy-tailed weights — the case round-robin gets wrong
    val rows = (1L to 97L).map(i => (i, (1000.0 / i).toLong + 1))
    val df = rows.toDF("doc_id", "w")
    val n = 8
    val got = Curation.serpentineShards(df, "doc_id", col("w"), n)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // naive reference: single row_number window + fold
    val naive = rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex
      .map { case ((id, _), i) =>
        val sCell = i % (2 * n)
        (id, if (sCell < n) sCell.toLong else (2 * n - 1 - sCell).toLong)
      }.toMap
    assert(got === naive)
    // balance: per-shard totals within one max-weight of each other
    val totals = Curation.serpentineShardReport(
        Curation.serpentineShards(df, "doc_id", col("w"), n))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(totals.keySet === (0L until n.toLong).toSet)
    val wMax = rows.map(_._2).max
    assert(totals.values.max - totals.values.min <= wMax,
      s"shard totals spread ${totals.values.max - totals.values.min} " +
        s"exceeds max weight $wMax: $totals")
    // counts differ by at most one
    val counts = Curation.serpentineShards(df, "doc_id", col("w"), n)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
  }

  test("effectiveTokenMass discounts by cluster size, singletons by 1") {
    val s = spark
    import s.implicits._
    // web: docs 1,2,3 form one 3-cluster (4 tokens each) + a singleton
    // (2 tokens); books: a 2-cluster (3 tokens each)
    val docs = Seq(
      (1L, "a b c d", "web"), (2L, "a b c d", "web"),
      (3L, "a b c d", "web"), (4L, "x y", "web"),
      (5L, "p q r", "books"), (6L, "p q r", "books"))
      .toDF("doc_id", "text", "source")
    val components = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (6L, 5L)).toDF("id", "component")
    val got = Curation.effectiveTokenMass(docs, "doc_id", "text",
        "source", components)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // web: 3 docs at 4/3 tokens (round(4e6/3) = 1333333 each) + 2
    // singleton tokens = 3*1333333 + 2000000
    assert(got("web") === ((4L, 14L, 3L * 1333333L + 2000000L)))
    // books: 2 docs at 3/2 tokens = 1500000 micro each
    assert(got("books") === ((2L, 6L, 3000000L)))
  }

  test("mixEpochPlan: sqrt allocation, epochs, remainder rates") {
    val s = spark
    import s.implicits._
    // domains of 100 / 9 / 1 docs: s_micro = 10e6 / 3e6 / 1e6,
    // S = 14e6; targets at N=55: round(55·10/14)=39, round(55·3/14)
    // =12, round(55·1/14)=4. big: 0 epochs + 390000 ppm; mid: 1 epoch
    // + rem 3/9 = 333333 ppm; tiny: 4 epochs + 0 ppm (pure upsample —
    // what temperatureSample cannot express)
    val d = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 109L).map(i => (i, "mid")) :+ (110L -> "tiny"))
      .toDF("doc_id", "source")
    val plan = Curation.mixEpochPlan(d, "source", targetN = 55L)
    val got = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("big") === ((100L, 39L, 0L, 390000L)), got.toString)
    assert(got("mid") === ((9L, 12L, 1L, 333333L)), got.toString)
    assert(got("tiny") === ((1L, 4L, 4L, 0L)), got.toString)
    // remainder sample: per-domain subset, below the rate's
    // expectation ceiling, and deterministic across calls
    val rem = Curation.mixEpochRemainder(d, "doc_id", "source", plan)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source")))
    assert(rem.forall { case (id, src) =>
      got(src)._4 > 0L && (src match {
        case "big" => id <= 100L
        case "mid" => id >= 101L && id <= 109L
        case _ => false
      })
    }, rem.toSeq.toString)
    val rem2 = Curation.mixEpochRemainder(d, "doc_id", "source", plan)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source")))
    assert(rem.sorted.toSeq === rem2.sorted.toSeq)
    // null domains drop from the plan entirely
    val withNull = d.unionAll(Seq((999L, null.asInstanceOf[String]))
      .toDF("doc_id", "source"))
    assert(Curation.mixEpochPlan(withNull, "source", 55L).count() === 3L)
  }

  test("dsirLogRatios/dsirScores: target-only phrases score " +
    "positive, raw-only negative, gram-less docs keep (0, 0)") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = target.unionAll(Seq(
      (2L, "gamma delta gamma delta gamma delta"),
      (3L, "x")).toDF("doc_id", "text"))
    val B = 64
    val ratios = Curation.dsirLogRatios(target, raw, "text", B)
      .localCheckpoint()
    // full bucket domain; target mass = the 5 bigrams of 6 tokens
    assert(ratios.count() === B.toLong)
    val masses = ratios.agg(sum(col("t_ct")), sum(col("r_ct")))
      .head()
    assert(masses.getLong(0) === 5L && masses.getLong(1) === 10L)
    val scores = Curation.dsirScores(raw, "doc_id", "text", ratios)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // the target document's phrase is over-represented in the target
    // distribution -> positive log ratios; the raw-only phrase is
    // under-represented -> negative; one token = no bigrams = (0, 0)
    assert(scores(1L)._1 === 5L && scores(1L)._2 > 0L,
      scores.toString)
    assert(scores(2L)._1 === 5L && scores(2L)._2 < 0L,
      scores.toString)
    assert(scores(3L) === ((0L, 0L)), scores.toString)
    // the score IS the sum of the doc's bucket ratios: re-derive
    // doc 2's score from the artifact directly
    val byBucket = ratios.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val gd = Seq("gamma delta", "delta gamma", "gamma delta",
      "delta gamma", "gamma delta")
    val expect2 = gd.map(g => byBucket(
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15), 16) % B)).sum
    assert(scores(2L)._2 === expect2, scores.toString)
  }

  test("dsirLogRatios invariance: identical target and raw corpora " +
    "give all-zero ratios and all-zero scores") {
    val s = spark
    import s.implicits._
    // T = R and t_ct = r_ct per bucket -> the smoothed ratio is
    // ln(1) = 0 in EVERY bucket, so every document scores 0: the
    // selection degenerates to pure Gumbel (uniform sampling) —
    // exactly DSIR's semantics when the target adds no information
    val rnd = new scala.util.Random(1313)
    val words = Vector("ka", "po", "mi", "ra", "zu", "el", "fo")
    val corpus = (1L to 30L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(
        words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val ratios = Curation.dsirLogRatios(corpus, corpus, "text", 32)
    assert(ratios.filter(col("ratio_micro") =!= 0L).count() === 0L)
    val scores = Curation.dsirScores(corpus, "doc_id", "text",
      ratios.localCheckpoint())
    assert(scores.filter(col("score_micro") =!= 0L).count() === 0L)
  }

  test("dsirSelect: Gumbel top-k keys are score + deterministic " +
    "draw, k >= n returns everything, prefix-consistent") {
    val s = spark
    import s.implicits._
    val target = Seq((1L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = target.unionAll(Seq(
      (2L, "gamma delta gamma delta gamma delta"),
      (3L, "x")).toDF("doc_id", "text"))
    val ratios = Curation.dsirLogRatios(target, raw, "text", 64)
      .localCheckpoint()
    val all = Curation.dsirSelect(raw, "doc_id", "text", ratios,
      k = 10).collect()
    assert(all.length === 3, all.mkString(","))
    // keys non-increasing; key = score + gumbel on every row
    val keys = all.map(_.getLong(4))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    all.foreach(r =>
      assert(r.getLong(4) === r.getLong(2) + r.getLong(3), r.toString))
    // smaller k is a prefix of the full ordering (sampling without
    // replacement: the draw is one set of keys, k only truncates)
    val top2 = Curation.dsirSelect(raw, "doc_id", "text", ratios,
      k = 2).collect().map(_.getLong(0)).toSeq
    assert(top2 === all.take(2).map(_.getLong(0)).toSeq)
    // the Gumbel draw is the documented deterministic function of
    // the id's portable hash — re-derive doc 2's draw independently
    val h = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("2".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16) % 1000000L
    val u = (h.toDouble + 0.5) / 1e6
    val g = BigDecimal(1e6 * -math.log(-math.log(u)))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(all.find(_.getLong(0) == 2L).get.getLong(3) === g)
  }

  test("mixRealize: epochs copies + remainder rows, exact where the " +
    "rate quantizes to 0 or the domain only downsamples") {
    val s = spark
    import s.implicits._
    // the mixEpochPlan fixture: big = 0 ep @390000ppm (remainder
    // only), mid = 1 ep @333333ppm, tiny = 4 ep @0ppm (pure integer
    // upsample — realized EXACTLY 4, no hash noise)
    val d = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 109L).map(i => (i, "mid")) :+ (110L -> "tiny"))
      .toDF("doc_id", "source")
    val plan = Curation.mixEpochPlan(d, "source", targetN = 55L)
      .localCheckpoint()
    val mix = Curation.mixRealize(d, "doc_id", "source", plan)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("epoch_no")))
    val bySrc = mix.groupBy(_._2)
    // tiny: exactly 4 full copies (epoch_no 1..4), zero remainder
    assert(bySrc("tiny").map(_._3).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // mid: every doc exactly once at epoch 1, plus remainder at 0
    val mid = bySrc("mid")
    assert(mid.count(_._3 == 1L) === 9)
    assert(mid.filter(_._3 == 0L).map(_._1).toSet.subsetOf(
      (101L to 109L).toSet))
    assert(mid.forall(t => t._3 == 0L || t._3 == 1L))
    // big: remainder-only (no full copies), every row epoch_no 0
    assert(bySrc("big").forall(_._3 == 0L))
    // the remainder rows ARE mixEpochRemainder's rows
    val remIds = Curation.mixEpochRemainder(d, "doc_id", "source",
      plan).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(mix.filter(_._3 == 0L).map(_._1).sorted.toSeq === remIds)
  }

  test("dsirGateStream: below-threshold rows drop per batch, " +
    "passing rows emit with scores, replay re-emits identically " +
    "(stateless gate over the pinned artifact)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    // target phrase-heavy artifact: the target corpus must carry
    // enough bigram MASS relative to the bucket count that Laplace
    // smoothing doesn't flatten observed grams below the raw rate
    // (with tn << B every ratio goes negative and nothing gates in)
    val target = Seq((100L,
        Iterator.continually("alpha beta").take(10).mkString(" ")))
      .toDF("doc_id", "text")
    val raw = target.unionByName(Seq(
      (1L, "alpha beta alpha beta"), // target-like: positive score
      (2L, "gamma delta gamma delta gamma")) // off-target: negative
      .toDF("doc_id", "text"))
    val ratios = Curation.dsirLogRatios(target, raw, "text", 16)
      .localCheckpoint()
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = Curation.dsirGateStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      ratios, minScoreMicro = 1L) { b =>
      seen ++= b.collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro")))
    }
    try {
      mem.addData((1L, "alpha beta alpha beta"),
        (2L, "gamma delta gamma delta gamma"))
      q.processAllAvailable()
      // replay the same rows: stateless, so the passing row re-emits
      // with the IDENTICAL score and the failing row still drops
      mem.addData((1L, "alpha beta alpha beta"),
        (2L, "gamma delta gamma delta gamma"))
      q.processAllAvailable()
      val byBatch = seen.groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
      assert(byBatch.keySet === Set(0L, 1L), seen.toString)
      assert(byBatch(0L).map(_._1) === Set(1L), seen.toString)
      assert(byBatch(0L) === byBatch(1L), "replay must re-emit " +
        s"identically (stateless): $seen")
      assert(byBatch(0L).forall(_._2 >= 1L), seen.toString)
    } finally q.stop()
  }
}
