package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over pair lists — the step AFTER dedup
  * clustering ([[Dedup.connectedComponents]]) when a pipeline wants to
  * rank within the duplicate/similarity graph rather than merely
  * partition it: PageRank centrality picks each cluster's most
  * "load-bearing" document (the one most near-dup-connected), a better
  * canonical-survivor policy than min-id when clusters are large and
  * heterogeneous.
  *
  * All arithmetic is INTEGER micro-units end to end (the d28/e13
  * discipline): ranks are longs, per-edge contributions use exact
  * integral division (`div`), and the only floating step — the damping
  * product — is a single IEEE double multiply + half-up round that
  * every engine computes bit-identically. Rank vectors are therefore
  * order-independent under Spark's partial aggregation and replayable
  * in a SQL oracle as chained CTEs, one per iteration.
  */
object GraphOps {

  /** Undirected PageRank in micro-units over a pair list.
    *
    * Nodes are the ids appearing in `pairs` (either side); each pair
    * contributes both directed edges. Iteration t+1:
    *
    *   r(v) = round((1−d)·1e6) + round(d · Σ_{u→v} (r(u) div deg(u)))
    *
    * with r₀(v) = 1e6 for every node — the unnormalized formulation,
    * so scores are comparable across corpus sizes and no 1/N constant
    * needs cross-engine agreement.
    *
    * Shape at scale: deg and the node set are one aggregation over the
    * edge list; every iteration is one edges⋈ranks equi-join on the
    * source id plus a partial-aggregating groupBy on the destination —
    * the corpus itself is never touched, only the (much smaller) pair
    * graph shuffles, co-partitioned on the node id across iterations.
    * A fixed iteration count keeps the oracle expressible; runs with
    * many iterations should truncate lineage per round with
    * `localCheckpoint` exactly as [[Dedup.connectedComponents]] does
    * (at the default 3 rounds the plan stays shallow without it).
    */
  def pageRankMicro(pairs: DataFrame, idACol: String, idBCol: String,
                    iterations: Int = 3,
                    damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val a = col(idACol).cast("long")
    val b = col(idBCol).cast("long")
    // null-id pairs are dropped, not nodes — same contract as
    // Dedup.connectedComponents (a null would otherwise ride the
    // groupBy as a phantom node that no equi-join ever feeds)
    val edges = pairs.select(a.as("src"), b.as("dst"))
      .union(pairs.select(b.as("src"), a.as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val baseMicro = math.round((1.0 - damping) * 1e6)
    var ranks = deg.select(col("src").as("id"),
      lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst"),
          expr("rank_micro div deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inflow"))
      // every node of an undirected graph has in-degree >= 1, so the
      // inner join loses nobody; isolated nodes never entered `deg`
      ranks = contribs.select(col("dst").as("id"),
        (lit(baseMicro) +
          round(lit(damping) * col("inflow")).cast("long"))
          .as("rank_micro"))
    }
    ranks
  }

  /** Triangle and wedge census of an undirected pair list — the
    * cohesion measure of dup clusters (a clique-ish cluster is one
    * document family; a barbell of two cliques joined by one spurious
    * LSH pair is two). Returns one row:
    * (n_triangles, n_wedges, clustering_micro) with the global
    * clustering coefficient 3·triangles/wedges in rounded micro-units.
    *
    * Enumeration is the oriented wedge join: every edge points up a
    * total order on the nodes, a wedge is two oriented edges sharing
    * their source, and a triangle is a wedge whose far pair is itself
    * an edge — an acyclic orientation gives every triangle exactly one
    * two-out-edge vertex, so each is found exactly once. Wedge count
    * for the denominator is Σ C(deg, 2) over FULL degrees (one
    * aggregation). Every step is an equi-join or aggregation on node
    * ids; nothing data-sized lands on the driver.
    *
    * `byDegree` picks the order: (degree, id) — the MPC-standard
    * skew-proof orientation (Suri & Vassilvitskii, WWW 2011): every
    * node's out-degree is O(√m), so a boilerplate hub yields O(m)
    * wedges instead of C(deg_hub, 2). The plain id order (byDegree =
    * false) skips the degree joins — fine when the graph is known
    * hub-free, and both orders produce the identical census
    * (spec-pinned), which is why the SQL oracle can replay the cheap
    * id form regardless.
    *
    * Input is normalized, not trusted: pairs orient to (min, max),
    * duplicates collapse, self-loops and null ids drop — so reversed
    * or repeated pair lists census identically. */
  def triangleCensus(pairs: DataFrame, idACol: String, idBCol: String,
                     byDegree: Boolean = true): DataFrame = {
    val e = normalizedEdges(pairs, idACol, idBCol)
    val deg = e.select(col("lo").as("id"))
      .union(e.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val wedges = orientedWedges(e, deg, byDegree)
    val triangles = wedges.join(e,
        least(wedges("v"), wedges("w")) === e("lo") &&
          greatest(wedges("v"), wedges("w")) === e("hi"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // coalesce: sum over an empty deg frame is null, and getLong on a
    // null primitive NPEs — an empty graph must census as (0, 0, 0)
    val wedgeTotal = deg
      .agg(coalesce(sum(expr("(deg * (deg - 1)) div 2")), lit(0L))
        .as("n_wedges"))
    // two 1-row frames: cross of singletons is a constant fold, not a
    // data cartesian (the PlanDiscipline BNLJ ban applies to DATA-sized
    // sides; join both via literals fetched driver-side instead)
    val t = triangles.head().getLong(0)
    val w = wedgeTotal.head().getLong(0)
    val coeff =
      if (w == 0) 0L else math.round(3.0 * t / w * 1e6)
    val spark = pairs.sparkSession
    import spark.implicits._
    Seq((t, w, coeff))
      .toDF("n_triangles", "n_wedges", "clustering_micro")
  }

  /** Normalized undirected edge list: (lo, hi) with lo < hi, distinct,
    * self-loops and null ids dropped. */
  def normalizedEdges(pairs: DataFrame, idACol: String,
                      idBCol: String): DataFrame = {
    val a = col(idACol).cast("long")
    val b = col(idBCol).cast("long")
    pairs.select(least(a, b).as("lo"), greatest(a, b).as("hi"))
      .filter(col("lo").isNotNull && col("hi").isNotNull &&
        col("lo") < col("hi"))
      .distinct()
  }

  /** The enumeration wedges of [[triangleCensus]]: unordered far pairs
    * (v, w) of two oriented edges sharing a source. Public so the
    * skew bound is testable — on a star, the degree order yields ZERO
    * wedges where the id order yields C(n−1, 2) when the hub happens
    * to carry the lowest id. */
  def orientedWedges(e: DataFrame, deg: DataFrame,
                     byDegree: Boolean): DataFrame = {
    val od =
      if (!byDegree) e.select(col("lo").as("src"), col("hi").as("dst"))
      else {
        val dl = deg.select(col("id").as("_lid"), col("deg").as("_ldeg"))
        val dh = deg.select(col("id").as("_hid"), col("deg").as("_hdeg"))
        // orient up the (degree, id) order; join keys are the node ids
        // the edge already carries, so at scale this co-partitions with
        // the degree frame
        e.join(dl, col("lo") === col("_lid"))
          .join(dh, col("hi") === col("_hid"))
          .select(
            when(col("_ldeg") < col("_hdeg") ||
              (col("_ldeg") === col("_hdeg")), col("lo"))
              .otherwise(col("hi")).as("src"),
            when(col("_ldeg") < col("_hdeg") ||
              (col("_ldeg") === col("_hdeg")), col("hi"))
              .otherwise(col("lo")).as("dst"))
      }
    od.as("o1").join(od.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.dst") < col("o2.dst"))
      .select(col("o1.dst").as("v"), col("o2.dst").as("w"))
  }
}
