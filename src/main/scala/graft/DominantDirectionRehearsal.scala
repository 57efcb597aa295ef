package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Dev/audit tool: PLANTED-TRUTH scale rehearsal for the distributed
  * power iteration (e19) — the claim the sf0.01 gate cannot check,
  * because the fixture's d = 64 also fits e18's d ≤ 256 driver form.
  * Here d = 1024 (a production embedding width the driver form
  * REFUSES — asserted), and the covariance matrix is PLANTED
  * directly: C = a·uuᵀ + b·I in integer micro for a fixed
  * deterministic direction u (the rank-1 spike whose eigenvectors a
  * diagonal shift preserves), generated map-side as the d(d+1)/2
  * upper-triangle cell frame e17 would produce. Planting the matrix
  * — rather than running the e17 co-moment pass over synthetic
  * vectors — keeps the rehearsal pointed at ITS claim: the matvec as
  * a row-keyed groupBy at d = 1024, with v broadcast per step; the
  * covariance build has its own entry-level verification at e17.
  *
  * Structural requires, not printouts:
  *  1. e18's driver form throws on d = 1024 (the cap is real);
  *  2. e19 runs the same 524 800-cell matrix distributed;
  *  3. |cos(v, u)| > 0.999 — the planted direction is recovered;
  *  4. delta_micro < 1e4 (1% of the 1e6 scale) — the convergence
  *     residual certifies the iterate;
  *  5. λ within 2% of the planted a·|u|² + b.
  *
  * Usage: sbt "runMain graft.DominantDirectionRehearsal [d]"
  * Results recorded in PLANS.md ("e19 scale rehearsal").
  */
object DominantDirectionRehearsal {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.map(_.toInt).getOrElse(1024)
    require(d > 256, "the rehearsal's point is a width e18 refuses")
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
      println(f"[e19] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // planted direction u: deterministic pseudo-random components in
    // [-1, 1] from a Knuth multiplicative hash (no Math.random —
    // reproducible runs)
    val u = Array.tabulate(d) { j =>
      val h = (j * 2654435761L) & 0xffffL
      (h.toDouble / 65535.0 - 0.5) * 2.0
    }
    val uNorm2 = u.map(x => x * x).sum
    val a = 0.04 // spike scale: cov cells ~ 4e4 micro
    val b = 0.001 // diagonal shift: preserves eigenvectors exactly
    val uLit = typedlit(u.toSeq)

    // the e17-shaped upper triangle, planted map-side: one explode
    // over sequence(i, d-1) per row of range(d) — 524 800 cells
    val cov = timed(s"plant C = a*uuT + b*I, d=$d") {
      spark.range(d.toLong).select(col("id").as("i"), uLit.as("u"))
        .select(col("i"), explode(expr(s"sequence(i, ${d - 1})"))
          .as("j"), col("u"))
        .select(col("i"), col("j"), lit(1L).as("n_vecs"),
          (round(lit(1e6) * (lit(a) *
            element_at(col("u"), col("i").cast("int") + 1) *
            element_at(col("u"), col("j").cast("int") + 1) +
            when(col("i") === col("j"), lit(b)).otherwise(lit(0.0)))))
            .cast("long").as("cov_micro"))
        .localCheckpoint()
    }
    require(cov.count() == d.toLong * (d + 1) / 2,
      "upper triangle must have d(d+1)/2 cells")

    // 1. the driver form's cap is real
    val refused =
      try { Similarity.dominantDirectionFromCov(cov, 5); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("bounded matrix")
      }
    require(refused, s"e18 must refuse d=$d")

    // 2-5. the distributed form runs it and recovers the plant
    val out = timed("distributed power iteration") {
      Similarity.dominantDirectionDistributed(cov, iters = 5)
        .collect()
    }
    val v = out.sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    val delta = out.head.getLong(3)
    val lam = out.head.getLong(2).toDouble / 1e6
    val vNorm = math.sqrt(v.map(x => x * x).sum)
    val cos = math.abs(
      v.zip(u).map { case (x, y) => x * y }.sum /
        (vNorm * math.sqrt(uNorm2)))
    val lamTrue = a * uNorm2 + b
    println(f"[e19] |cos(v, planted u)| = $cos%.6f  delta_micro = " +
      f"$delta  lambda = $lam%.4f (true ${lamTrue}%.4f)")
    require(cos > 0.999, s"planted direction not recovered: cos=$cos")
    require(delta < 10000L, s"iterate not converged: delta=$delta")
    require(math.abs(lam - lamTrue) / lamTrue < 0.02,
      s"lambda $lam vs planted $lamTrue")
    println("[e19] rehearsal PASSED")
    spark.stop()
  }
}
