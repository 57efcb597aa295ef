package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, GraphOps, TextStats}

/** Dev/audit tool: the round-10 graph rehearsal (VERDICT r9 task 7) —
  * personalized PageRank under the 10k-degree hub and at 50M edges,
  * plus the g8 PMI→LPA composition's lineage audit.
  *
  *   1. PPR hub section: weld the 10k-leaf star onto the real
  *      near-dup pair graph. Planted truths: (a) hub-seeded PPR gives
  *      every leaf the SAME rank (symmetry), (b) a seed in the clean
  *      component produces ranks IDENTICAL to the clean-graph run on
  *      clean nodes and zero on star nodes (the star is disconnected;
  *      seed-local teleport must not leak mass across components).
  *   2. 50M-edge ring: PPR seeded at node 0 on a 50M-node cycle.
  *      Planted truth: after 3 iterations exactly the 7 nodes within
  *      3 hops are nonzero, with ranks equal to the closed-form
  *      integer recurrence (computed independently in Scala, same
  *      div/round discipline) — micro-exact. Measures the dense
  *      node-sized frame cost per iteration at 100M directed edges.
  *   3. g8 composition: PMI top-k feeds BOTH the edge list and the
  *      word-id map — two consumers of a corpus-sized lineage. A/B
  *      the un-pinned form against a localCheckpoint pin of the
  *      k-row PMI result (the d35 rule: pin only expensive lineages —
  *      here the PINNED frame is tiny but its lineage is the whole
  *      corpus token scan).
  *
  * Usage: sbt "runMain graft.PprRehearsal [sfDir] [hubDegree] [ringEdges]"
  * Results recorded in PLANS.md ("PPR + g8 rehearsal").
  */
object PprRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hubDegree = args.lift(1).map(_.toInt).getOrElse(10000)
    val ringEdges = args.lift(2).map(_.toLong).getOrElse(50000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- 1. PPR under the hub ------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nearDup = Dedup.lshVerifiedJaccardPairs(docs, "doc_id", "text",
      threshold = 0.3).select("id_a", "id_b").localCheckpoint()
    println(s"[rehearsal] near-dup pairs: ${nearDup.count()}")
    val hubId = 90000000L
    val hub = {
      import spark.implicits._
      (1 to hubDegree).map(i => (hubId, hubId + i)).toDF("id_a", "id_b")
    }
    val hubbed = nearDup.unionByName(hub).localCheckpoint()

    // (a) hub-seeded: all leaves symmetric
    val hubSeeded = timed(s"PPR hub-seeded (deg-$hubDegree star)")(
      GraphOps.personalizedPageRankMicro(hubbed, "id_a", "id_b",
        seeds = Seq(hubId)).localCheckpoint())
    val leafRanks = hubSeeded.filter(col("id") > hubId)
      .select("rank_micro").distinct().collect().map(_.getLong(0))
    require(leafRanks.length == 1 && leafRanks.head > 0,
      s"star leaves must share one positive rank, got " +
        leafRanks.mkString(","))
    val hubRank = hubSeeded.filter(col("id") === hubId)
      .head().getLong(1)
    println(s"[rehearsal] hub rank=$hubRank leaf rank=${leafRanks.head}")

    // (b) clean-component seed: the star must not change anything
    val cleanSeed: Long = nearDup.select(col("id_a")).orderBy("id_a")
      .head().getLong(0)
    val onClean = timed("PPR clean-seeded on CLEAN graph")(
      GraphOps.personalizedPageRankMicro(nearDup, "id_a", "id_b",
        seeds = Seq(cleanSeed)))
    val onHubbed = timed("PPR clean-seeded on HUBBED graph")(
      GraphOps.personalizedPageRankMicro(hubbed, "id_a", "id_b",
        seeds = Seq(cleanSeed)))
    val diff = onClean.as("a")
      .join(onHubbed.as("b"), col("a.id") === col("b.id"), "full")
      .filter(col("a.id") < hubId || col("b.id") < hubId)
      .filter(!(col("a.rank_micro") <=> col("b.rank_micro"))).count()
    val starMass = onHubbed.filter(col("id") >= hubId)
      .agg(sum("rank_micro")).head().getLong(0)
    require(diff == 0L,
      s"clean-node ranks changed under the welded star: $diff rows")
    require(starMass == 0L,
      s"teleport mass leaked into the disconnected star: $starMass")
    println("[rehearsal] clean-seed ranks identical; star mass 0")

    // ---- 2. 50M-edge ring ----------------------------------------
    val n = ringEdges
    val ring = spark.range(n).select(col("id").as("id_a"),
      pmod(col("id") + 1, lit(n)).as("id_b"))
    val iterations = 3
    val pprRing = timed(s"PPR 3 iters on $n-edge ring")(
      GraphOps.personalizedPageRankMicro(ring, "id_a", "id_b",
        seeds = Seq(0L), iterations = iterations)
        .filter(col("rank_micro") > 0).collect())
    // closed-form integer recurrence by hop distance (deg 2
    // everywhere, no wraparound at this n): r(d) over d in [0, 3]
    val damping = 0.85
    val base = math.round((1.0 - damping) * 1e6)
    var r = Map(0L -> 1000000L).withDefaultValue(0L)
    for (_ <- 1 to iterations) {
      val next = (0L to iterations).map { d =>
        val inflow =
          if (d == 0) 2L * (r(1L) / 2L)
          else (r(d - 1) / 2L) + (r(d + 1) / 2L)
        d -> (math.round(damping * inflow) +
          (if (d == 0) base else 0L))
      }.toMap.withDefaultValue(0L)
      r = next
    }
    val want = (for (d <- 0L to 3L; id <- Set(d, (n - d) % n)
      if r(d) > 0L) yield id -> r(d)).toMap
    val got = pprRing.map(row => row.getLong(0) -> row.getLong(1)).toMap
    require(got == want,
      s"ring PPR mismatch:\n got=$got\nwant=$want")
    println(s"[rehearsal] ring nonzero nodes=${got.size} " +
      s"(planted ${want.size}); ranks micro-exact vs recurrence")

    // sparse frontier on the same ring: identical planted truth, the
    // per-round join probe is the 7-node frontier instead of the 50M
    // node-sized rank frame
    val pprRingSparse = timed(s"PPR 3 iters SPARSE on $n-edge ring")(
      GraphOps.personalizedPageRankMicro(ring, "id_a", "id_b",
        seeds = Seq(0L), iterations = iterations, sparse = true)
        .filter(col("rank_micro") > 0).collect())
    val gotSparse = pprRingSparse
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    require(gotSparse == want,
      s"sparse ring PPR mismatch:\n got=$gotSparse\nwant=$want")
    println("[rehearsal] sparse ring ranks micro-exact vs recurrence")

    // sparse == dense on the real hubbed graph, node for node
    val denseHub = hubSeeded.collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    val sparseHub = timed("PPR hub-seeded SPARSE (hubbed)")(
      GraphOps.personalizedPageRankMicro(hubbed, "id_a", "id_b",
        seeds = Seq(hubId), sparse = true).collect())
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    require(sparseHub == denseHub,
      "sparse vs dense PPR diverged on the hubbed near-dup graph")
    println("[rehearsal] sparse == dense on hubbed graph " +
      s"(${denseHub.size} nodes)")

    // ---- 3. g8 composition pin A/B --------------------------------
    def g8(pin: Boolean): DataFrame = {
      val pmi0 = TextStats.pmiCollocations(docs, "doc_id", "text",
        minCount = 10, k = 300)
      val pmi = if (pin) pmi0.localCheckpoint() else pmi0
      val w1 = element_at(split(col("bigram"), " "), 1)
      val w2 = element_at(split(col("bigram"), " "), 2)
      val edges = pmi.select(Dedup.md5Long60(w1).as("id_a"),
        Dedup.md5Long60(w2).as("id_b"))
      val words = pmi
        .select(explode(array(w1, w2)).as("word")).distinct()
        .withColumn("id", Dedup.md5Long60(col("word")))
      GraphOps.labelPropagation(edges, "id_a", "id_b", rounds = 3)
        .join(words, "id")
        .select(col("word"), col("label"))
    }
    val unpinned = timed("g8 PMI->LPA un-pinned")(
      g8(pin = false).collect().map(x => (x.getString(0), x.getLong(1)))
        .sortBy(_._1).toSeq)
    val pinned = timed("g8 PMI->LPA pinned (k-row PMI checkpoint)")(
      g8(pin = true).collect().map(x => (x.getString(0), x.getLong(1)))
        .sortBy(_._1).toSeq)
    require(unpinned == pinned, "pin changed the g8 labels")
    println(s"[rehearsal] g8 words=${pinned.size}; pin A/B equal")

    spark.stop()
  }
}
