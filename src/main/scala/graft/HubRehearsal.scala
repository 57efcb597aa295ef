package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, GraphOps}

/** Dev/audit tool: the adversarial-skew rehearsal for the graph family
  * (VERDICT r6 task 3). Builds the REAL verified near-dup pair graph at
  * the given SF, then welds a power-law hub onto it (one node paired
  * with `hubDegree` distinct synthetic neighbors — the boilerplate-
  * document shape that breaks id-oriented triangle enumeration), and
  * measures:
  *
  *   - triangleCensus with the degree orientation vs the id
  *     orientation (the enumeration-wedge counts AND wall-clock);
  *   - pageRankMicro (3 iterations, the g1 form) on the hubbed graph;
  *   - pageRankUntil to the integer fixed point, and whether its
  *     top-k ORDER agrees with the 3-iteration form on the clean
  *     near-dup graph (the production claim behind the g1 oracle).
  *
  * Usage: sbt "runMain graft.HubRehearsal [sfDir] [hubDegree]"
  * Results are recorded in PLANS.md ("Hub-skew rehearsal").
  */
object HubRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hubDegree = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nearDup = Dedup.lshVerifiedJaccardPairs(docs, "doc_id", "text",
      threshold = 0.3).select("id_a", "id_b").localCheckpoint()
    println(s"[rehearsal] near-dup pairs: ${nearDup.count()}")

    // hub id far outside the doc-id space, neighbors likewise
    val hub = (1 to hubDegree)
      .map(i => (90000000L, 90000000L + i)).toDF("id_a", "id_b")
    val hubbed = nearDup.unionByName(hub).localCheckpoint()

    val e = GraphOps.normalizedEdges(hubbed, "id_a", "id_b")
      .localCheckpoint()
    val deg = e.select(col("lo").as("id"))
      .union(e.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg")).localCheckpoint()
    val wId = timed("orientedWedges by-id count")(
      GraphOps.orientedWedges(e, deg, byDegree = false).count())
    val wDeg = timed("orientedWedges by-degree count")(
      GraphOps.orientedWedges(e, deg, byDegree = true).count())
    println(s"[rehearsal] enumeration wedges: id=$wId degree=$wDeg")
    val cId = timed("triangleCensus by-id")(
      GraphOps.triangleCensus(hubbed, "id_a", "id_b", byDegree = false)
        .collect().head)
    val cDeg = timed("triangleCensus by-degree")(
      GraphOps.triangleCensus(hubbed, "id_a", "id_b").collect().head)
    require(cId == cDeg, s"census disagreement: $cId vs $cDeg")
    println(s"[rehearsal] census: $cDeg")

    val pr3 = timed("pageRankMicro 3 iters (hubbed)")(
      GraphOps.pageRankMicro(hubbed, "id_a", "id_b").count())
    println(s"[rehearsal] pageRank nodes: $pr3")

    // LPA under the hub: the star is one wide groupBy key — partial
    // aggregation must absorb it (the pageRankMicro argument). A star
    // is BIPARTITE, i.e. exactly the synchronous-update oscillation
    // the scaladoc documents: the hub and its leaves swap labels each
    // round. The invariant that must hold anyway: all leaves agree
    // with each other every round (they see the same neighborhood),
    // so the star carries at most 2 labels — leaves' and the hub's.
    val lpaFrame = GraphOps.labelPropagation(hubbed, "id_a", "id_b",
      rounds = 3).localCheckpoint()
    val lpaNodes = timed("labelPropagation 3 rounds (hubbed)")(
      lpaFrame.count())
    val leafLabels = lpaFrame.filter(col("id") > 90000000L)
      .select("label").distinct().count()
    val starLabels = lpaFrame.filter(col("id") >= 90000000L)
      .select("label").distinct().count()
    println(s"[rehearsal] LPA nodes: $lpaNodes; leaf labels " +
      s"(must be 1): $leafLabels; star labels (<=2, the documented " +
      s"bipartite oscillation): $starLabels")
    require(leafLabels == 1L, "all leaves must agree every round")
    require(starLabels <= 2L, "star must carry at most hub+leaf labels")

    // edgeEmbeddedness under the hub: the degree orientation points
    // every leaf edge AT the hub (leaf out-degree 1, hub out-degree 0),
    // so the star contributes ZERO wedges — supported-edge counts on
    // hubbed vs clean graphs must be identical, and the hub costs
    // nothing beyond its edge rows
    val embHub = timed("edgeEmbeddedness (hubbed)")(
      GraphOps.edgeEmbeddedness(hubbed, "id_a", "id_b")
        .filter(col("cn_cnt") > 0).count())
    val embClean = timed("edgeEmbeddedness (clean)")(
      GraphOps.edgeEmbeddedness(nearDup, "id_a", "id_b")
        .filter(col("cn_cnt") > 0).count())
    println(s"[rehearsal] supported edges: hubbed=$embHub clean=$embClean")
    require(embHub == embClean,
      "a triangle-free star must not change the supported-edge count")

    // production claim: convergence-stopped ranks order the top-k the
    // same way the 3-iteration oracle form does on the CLEAN graph
    def topK(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      df.orderBy(desc("rank_micro"), asc("id")).limit(k)
        .collect().map(_.getLong(0)).toSeq
    val (fixed, iters, conv) = timed("pageRankUntil fixed point (clean)")(
      GraphOps.pageRankUntilStats(nearDup, "id_a", "id_b", epsMicro = 4L,
        maxIterations = 150))
    println(s"[rehearsal] fixed point: iterations=$iters converged=$conv")
    val three = GraphOps.pageRankMicro(nearDup, "id_a", "id_b")
    val (tFixed, tThree) = (topK(fixed, 20), topK(three, 20))
    println(s"[rehearsal] top-20 order agreement (fixed vs 3-iter): " +
      s"${tFixed == tThree}; set agreement: " +
      s"${tFixed.toSet == tThree.toSet}")
    println(s"[rehearsal] fixed=$tFixed")
    println(s"[rehearsal] three=$tThree")

    // degree assortativity under the hub: a pure star is PERFECTLY
    // disassortative (degree pairs are (k,1)/(1,k) two-point,
    // r = −1 exactly — planted truth), and welding it onto the real
    // graph must drag the measured r DOWN, at one degree-join's cost
    val aStar = timed(s"degreeAssortativity (pure $hubDegree-star)")(
      GraphOps.degreeAssortativity(hub, "id_a", "id_b").head())
    require(aStar.getDouble(1) == -1.0,
      s"a pure star must give r = -1 exactly, got $aStar")
    val aClean = timed("degreeAssortativity (clean)")(
      GraphOps.degreeAssortativity(nearDup, "id_a", "id_b").head())
    val aHub = timed("degreeAssortativity (hubbed)")(
      GraphOps.degreeAssortativity(hubbed, "id_a", "id_b").head())
    println(s"[rehearsal] assortativity clean=${aClean.getDouble(1)} " +
      s"hubbed=${aHub.getDouble(1)} (star drags it down)")
    require(aHub.getDouble(1) < aClean.getDouble(1),
      "welding a star must lower assortativity")

    // modularity: planted k disjoint triangles → Q = 1 − 1/k exactly
    // (S = 6k, Σm_c = 3k, Σd_c² = 36k), re-derived through the
    // operator's own one-division contract; then the hubbed graph
    // measured (the star joins the hub's community; cost is the LPA
    // rounds the g5 rehearsal already prices)
    val k = 1000000L
    val tri = spark.range(k).select(col("id"))
      .select(explode(array(
        struct((col("id") * 3).as("id_a"), (col("id") * 3 + 1).as("id_b")),
        struct((col("id") * 3).as("id_a"), (col("id") * 3 + 2).as("id_b")),
        struct((col("id") * 3 + 1).as("id_a"),
          (col("id") * 3 + 2).as("id_b")))).as("e"))
      .select(col("e.id_a").as("id_a"), col("e.id_b").as("id_b"))
    val mTri = timed(s"modularity ($k disjoint triangles)")(
      GraphOps.modularity(tri, "id_a", "id_b", rounds = 3).head())
    val s6k = BigInt(6) * k
    val wantQ = BigDecimal((2 * s6k * (3 * k) - 36 * k).doubleValue /
        (s6k * s6k).doubleValue)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    require(mTri.getLong(0) == 3 * k && mTri.getLong(1) == k,
      s"triangle partition shape: $mTri")
    require(mTri.getDouble(2) == wantQ,
      s"planted Q = 1 - 1/k: want $wantQ got $mTri")
    println(s"[rehearsal] modularity($k cliques)=${mTri.getDouble(2)} " +
      s"(= 1 - 1/k) ok")
    val mHub = timed("modularity (hubbed near-dup)")(
      GraphOps.modularity(hubbed, "id_a", "id_b", rounds = 3).head())
    println(s"[rehearsal] modularity hubbed: edges=${mHub.getLong(0)} " +
      s"communities=${mHub.getLong(1)} Q=${mHub.getDouble(2)}")
    spark.stop()
  }
}
