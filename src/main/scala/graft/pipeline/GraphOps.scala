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
}
