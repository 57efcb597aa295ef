package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Eval, HeavyHitters}

/** Dev/audit tool: PLANTED-TRUTH scale rehearsal for the round-11
  * continuation's sketch family (Count-Min, KMV set algebra) — the
  * 100 TB posture check the sf0.01 oracle gate cannot give.
  *
  * 1. Count-Min at 50M items: 20 planted heavy hitters of exactly
  *    1,000,000 occurrences each ride a 30M-singleton noise tail.
  *    The ONE pass builds the 4×1024 cell table (shuffle carries
  *    cells, never items); estimates for the planted items must
  *    satisfy the one-sided bound est ≥ exact, and the overcount is
  *    reported against the 2N/w expectation (~24k at N=50M, w=1024).
  *    Exact counts come from the PLANT, not a 30M-key groupBy — the
  *    point of a point-estimate sketch is precisely not paying that
  *    shuffle.
  *
  * 2. KMV set algebra at 2M×2M distinct keys with a planted 500k
  *    overlap (k=1024): union is 3.5M, intersection 500k by
  *    construction; the estimates must land within 15% (union) and
  *    30% (intersection) of the plant — k=1024 gives ~3% σ on the
  *    union and the intersection inherits the jaccard-ratio noise.
  *    Deterministic: the portable md5 hash fixes every estimate.
  *
  * Usage: sbt "runMain graft.SketchRehearsal [nMillions]"
  */
object SketchRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
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
      println(f"[sketch] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // ---- 1. Count-Min at nM million items -------------------------
    // 20 planted heavy hitters (hh_0..hh_19), each with exactly
    // hhCount occurrences, interleaved with singleton noise.
    val n = nM * 1000000L
    val hhCount = n / 50L // 20 hitters × n/50 = 40% of the stream
    val items = spark.range(n).select(
      when(pmod(col("id"), lit(50L)) < 20,
        concat(lit("hh_"), pmod(col("id"), lit(50L))))
        .otherwise(concat(lit("t_"), col("id"))).as("item"))

    val cms = timed(s"cms_build_${nM}M") {
      HeavyHitters.countMinTable(items, col("item"),
        depth = 4, width = 1024).localCheckpoint()
    }
    val planted = spark.range(20)
      .select(concat(lit("hh_"), col("id")).as("item"),
        lit(hhCount).as("exact_count"))
    val est = timed("cms_estimates") {
      HeavyHitters.countMinEstimates(cms, planted, col("item"),
          depth = 4, width = 1024)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    }
    est.foreach { case (item, (exact, e)) =>
      require(e >= exact,
        s"CMS undercounted $item: $e < $exact — the one-sided bound broke")
    }
    val over = est.map { case (_, (exact, e)) => e - exact }
    println(s"[sketch] cms overcounts: min=${over.min} " +
      s"max=${over.max} (2N/w expectation ~${2 * n / 1024})")
    require(over.max <= 8L * n / 1024,
      s"CMS overcount ${over.max} beyond 8N/w — cells are corrupt")

    // ---- 2. KMV set algebra with a planted overlap ----------------
    // A = [0, 2M), B = [1.5M, 3.5M): union 3.5M, intersection 500k.
    val aN = 2000000L
    val overlap = 500000L
    val ab = spark.range(2 * aN - overlap).select(col("id").as("u"),
      (col("id") < aN).as("a"), (col("id") >= aN - overlap).as("b"))
    val so = timed("kmv_setops_2Mx2M") {
      Eval.kmvSetOps(ab, col("u"), col("a"), col("b"), k = 1024)
        .head()
    }
    val trueUnion = 2 * aN - overlap
    println(s"[sketch] kmv: exact=(${so.getLong(0)}, ${so.getLong(1)}, " +
      s"${so.getLong(2)}, ${so.getLong(3)}) est_union=${so.getDouble(4)} " +
      s"est_inter=${so.getDouble(5)}")
    require(so.getLong(2) == trueUnion && so.getLong(3) == overlap,
      "exact side diverged from the plant")
    require(math.abs(so.getDouble(4) / trueUnion - 1.0) < 0.15,
      s"union estimate ${so.getDouble(4)} off >15% from $trueUnion")
    require(math.abs(so.getDouble(5) / overlap - 1.0) < 0.30,
      s"intersection estimate ${so.getDouble(5)} off >30% from $overlap")

    println("[sketch] ALL CHECKS PASSED")
    spark.stop()
  }
}
