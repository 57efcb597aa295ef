package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.GraphOps

/** Dev/audit tool: PLANTED-COMMUNITY scale rehearsal for the Louvain
  * fixpoint loop (g18) — r13 verdict task 8: g18 converges on the
  * ~300-edge sf0.1 word graph; this pins the same claims on a graph
  * two orders of magnitude bigger, so the 100× posture of the newest
  * loop operator is evidence, not inference. The graph is PLANTED
  * (the KllRehearsal discipline — deterministic, no data dependence,
  * ground truth known by construction): C communities, each a
  * 10-node CLIQUE (45 intra edges), cliques bridged in MATCHED PAIRS
  * (one bridge between cliques 2t and 2t+1) — at the default
  * C = 2000 that is 20 000 nodes and 91 000 distinct edges (~300×
  * g18's word graph).
  *
  * Why pairs and not a ring: modularity's resolution limit
  * (Fortunato & Barthélemy, PNAS 2007) makes merging adjacent small
  * cliques Q-IMPROVING until the merged degree reaches ~sqrt(2m), so
  * bridges arranged in a RING feed an unbounded drip of positive-
  * gain merges — correct Louvain behavior whose synchronous
  * small-id-guarded sweeps realize only a few merges per level, i.e.
  * hundreds of levels to exhaust (measured: communities 2000 → 1998
  * → 1993 with Q creeping +0.0005/level). MATCHED pairs bound the
  * merge structure: each bridge is Q-positive exactly once, the
  * fixpoint is the C/2 merged pairs, and the no-move sweep arrives
  * in a handful of levels. The planted-truth audit is on Q (the
  * fixpoint keeps ~91/91 of edge mass intra: Q ≈ 0.988) plus a
  * community-count corridor around C/2.
  *
  * Structural requires, not printouts:
  *  1. fixpoint before the cap: n_levels < maxLevels = 8 — the loop
  *     EXITS on a no-move sweep at this scale, not on the cost cap;
  *  2. per-level Q non-decrease: Q(louvainConverged(maxLevels = L))
  *     non-decreasing over L = 1, 2, 3, 8 (the g18 scaladoc claim,
  *     measured through modularityOfLabels on the full graph);
  *  3. recovery: final Q ≥ 0.85 and the community count lands in
  *     [C/4, 2C] — the corridor around the C/2 merged pairs the
  *     resolution limit prescribes (a collapse to a handful of
  *     giant communities and a no-contraction stall both fail);
  *  4. level-loop state: the label frame stays exactly one row per
  *     ORIGINAL node at every L (labels compose; they never expand),
  *     and driver-side state is one Long per level (the move count)
  *     — the shape that survives 100×.
  *
  * Usage: sbt "runMain graft.LouvainRehearsal [nCommunities]"
  * Results recorded in PLANS.md ("Louvain scale rehearsal").
  */
object LouvainRehearsal {
  def main(args: Array[String]): Unit = {
    val cComm = args.headOption.map(_.toInt).getOrElse(2000)
    require(cComm >= 4, "need at least 4 communities")
    val sz = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[louvain] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val n = cComm.toLong * sz
    // planted graph: each community a clique (every node joins all
    // higher in-community positions), one bridge per adjacent
    // community pair on a community ring
    val base = spark.range(n).select(col("id").as("a"),
      expr(s"id div $sz").as("c"), expr(s"id % $sz").as("p"))
    // guard the top position: Spark's sequence(start, stop) REVERSES
    // when start > stop, so p = S-1 would emit a stray descending
    // pair instead of nothing
    val clique = base.select(col("a"),
        explode(expr(s"if(p < ${sz - 1}, " +
          s"sequence(p + 1, ${sz - 1}), array())")).as("q"),
        col("c"))
      .select(col("a"), (col("c") * sz + col("q")).as("b"))
    val bridges = spark.range(cComm.toLong / 2).select(
      (col("id") * 2L * sz).as("a"),
      ((col("id") * 2L + 1L) * sz).as("b"))
    val pairs = clique.unionByName(bridges).localCheckpoint()
    val e = GraphOps.normalizedEdges(pairs, "a", "b").localCheckpoint()
    val m = e.count()
    println(s"[louvain] planted: C=$cComm S=$sz nodes=$n edges=$m")

    def qOf(maxLevels: Int): (Double, Long, Long) = {
      val lab = timed(s"louvainConverged(L=$maxLevels)") {
        GraphOps.louvainConverged(pairs, "a", "b", maxLevels)
          .localCheckpoint()
      }
      // require 4: one row per original node at EVERY L — the label
      // frame composes, it never expands
      require(lab.count() == n,
        s"L=$maxLevels: label rows ${lab.count()} != $n")
      val levels = lab.select(max(col("n_levels"))).head().getLong(0)
      val nComm = lab.select(countDistinct(col("community")))
        .head().getLong(0)
      val q = GraphOps.modularityOfLabels(e,
          lab.select(col("id"), col("community").as("label")))
        .head().getAs[Double]("modularity")
      println(f"[louvain] L=$maxLevels%-2d levels=$levels " +
        f"communities=$nComm%6d Q=$q%.6f")
      (q, levels, nComm)
    }

    val results = Seq(1, 2, 3, 8).map(l => l -> qOf(l))
    // require 2: Q non-decreasing in the level budget
    results.zip(results.tail).foreach { case ((la, (qa, _, _)),
        (lb, (qb, _, _))) =>
      require(qb >= qa, s"Q decreased: L=$la Q=$qa -> L=$lb Q=$qb")
    }
    val (qFin, levelsFin, nCommFin) = results.last._2
    // require 1: fixpoint reached before the cap
    require(levelsFin < 8, s"no fixpoint under cap: levels=$levelsFin")
    // require 3: recovery — high Q, community count in the corridor
    // around the C/2 merged pairs the resolution limit prescribes
    require(qFin >= 0.85, s"Q=$qFin < 0.85 — degenerate partition")
    require(nCommFin >= cComm / 4 && nCommFin <= 2L * cComm,
      s"found $nCommFin communities for $cComm planted (expect ~C/2)")
    println(s"[louvain] PASS: fixpoint at $levelsFin levels, " +
      f"Q=$qFin%.6f, $nCommFin communities for $cComm planted")
    spark.stop()
  }
}
