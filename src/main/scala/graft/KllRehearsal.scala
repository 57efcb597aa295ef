package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.KllSketch

/** Dev/audit tool: PLANTED-TRUTH scale rehearsal for the KLL quantile
  * sketch (q106/q107) — the 100 TB posture check the sf0.01 gate
  * cannot give. The corpus is the identity permutation 1..n, so every
  * quantile's TRUE value equals its target rank and the rank error of
  * an estimate is |est − target| exactly — no exact-quantile job
  * needed to audit a 20M-row run (the point of the sketch is not
  * paying that job).
  *
  * Three structural requires, not printouts:
  *  1. one-shot sketch over n rows: every audited quantile within the
  *     entries' 8n/k acceptance bound; retained items ≤ 4k (O(k)
  *     state no matter how large n grows);
  *  2. a 32-way MERGE (the per-partition partial path a cluster
  *     takes, here forced explicitly through groupBy(id % 32) →
  *     driver-side fold): weight conserved EXACTLY at n, same bound;
  *  3. the merged sketch's weight equals the one-shot's — compaction
  *     never leaks or invents mass under any merge tree.
  *
  * Usage: sbt "runMain graft.KllRehearsal [nMillions]"
  * Results recorded in PLANS.md ("KLL scale rehearsal").
  */
object KllRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(20)
    require(nM >= 1, "need at least 1M rows")
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
      println(f"[kll] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val n = nM * 1000000L
    val k = 256
    val bound = 8L * n / k
    val qs = Seq(10L, 250L, 500L, 750L, 990L)
    def audit(label: String, st: graft.functions.KllState): Unit = {
      require(KllSketch.totalWeight(st) == n,
        s"$label: weight ${KllSketch.totalWeight(st)} != $n")
      require(KllSketch.numRetained(st) <= 4 * k,
        s"$label: retained ${KllSketch.numRetained(st)} > ${4 * k}")
      qs.foreach { q =>
        val est = KllSketch.quantileOf(st, q).get
        val target = math.min(n, math.max(1L, (q * n + 999L) / 1000L))
        val err = math.abs(est - target)
        println(f"[kll] $label q=$q%4d est=$est%9d err=$err%7d " +
          f"(bound $bound)")
        require(err <= bound, s"$label q=$q: err $err > bound $bound")
      }
    }

    // 1..n shifted to start at 1 (range is 0-based)
    val vals = spark.range(n).select((col("id") + 1L).as("v"))

    val oneShot = timed(s"one_shot_${nM}M") {
      KllSketch.fromRow(
        vals.agg(KllSketch.agg(k, col("v"))).head().getStruct(0))
    }
    audit("one_shot", oneShot)

    val merged = timed(s"merge32_${nM}M") {
      val parts = vals.groupBy(pmod(col("v"), lit(32L)).as("b"))
        .agg(KllSketch.agg(k, col("v")).as("sk"))
        .orderBy("b").collect()
        .map(r => KllSketch.fromRow(r.getStruct(1)))
      parts.reduceLeft(KllSketch.mergeStates(_, _, k))
    }
    audit("merge32", merged)
    require(KllSketch.totalWeight(merged) ==
      KllSketch.totalWeight(oneShot),
      "merge path must conserve exactly the one-shot weight")

    println(s"[kll] OK: n=$n k=$k bound=$bound — all requires held")
    spark.stop()
  }
}
