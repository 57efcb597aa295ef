package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DistributedSelect

/** Dev/audit tool: the scale rehearsal for exact distributed selection
  * (VERDICT r8 task 6). At sf0.1 the median resolves in ~1 narrowing
  * round, so the multi-round path is only exercised by q50's tight
  * threshold; this main synthesizes a much larger value column (N
  * rows, heavy-tailed — the distribution shape that defeats equi-width
  * assumptions) and measures what the PLANS.md log_B claim asserts:
  *
  *   - rounds actually used by kthSmallest for the exact median and
  *     P99 at a tight resolve threshold, and wall-clock per round
  *     (each round = one range-filtered scan + a B-cell count);
  *   - the same exact quantile through Spark's built-in `percentile`
  *     aggregate (exact, value-count map per aggregator — the
  *     single-node memory wall this operator exists to avoid);
  *   - the literal ORDER BY + row_number translation (global sort into
  *     ONE task) at a reduced N, where its single-task sort makes the
  *     crossover visible without stalling the rehearsal.
  *
  * Values are deterministic (xxhash64-seeded uniform → exponential via
  * -ln(u): heavy tail, ~58% of mass in the first of 128 equi-width
  * cells at this range, so narrowing cannot shortcut by luck).
  *
  * Usage: sbt "runMain graft.SelectRehearsal [N] [sortN]"
  * Results are recorded in PLANS.md ("DistributedSelect scale
  * rehearsal").
  */
object SelectRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val sortN = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[select-rehearsal] $label%-42s $dt%8.2f s")
      (r, dt)
    }

    // deterministic heavy-tailed values: u ~ U(0,1) from xxhash64,
    // v = -ln(u) (exponential; max ~ ln(2^63) ≈ 43.7, median ln 2)
    val vals = spark.range(n).select(
      (-log((abs(xxhash64(col("id"))) % lit(1000000000L) + lit(1L))
        .cast("double") / lit(1000000001.0))).as("v"))
      .localCheckpoint() // pin: every contender reads the same rows

    val k50 = n / 2
    val k99 = math.max(1L, math.ceil(0.99 * n).toLong)

    val ((med, r50), _) = timed(s"kthSmallest median (N=$n, thr=1000)") {
      DistributedSelect.kthSmallest(vals, "v", k50, buckets = 128,
        threshold = 1000)
    }
    println(s"[select-rehearsal]   median=$med rounds=$r50")
    val ((p99, r99), _) = timed(s"kthSmallest P99 (N=$n, thr=1000)") {
      DistributedSelect.kthSmallest(vals, "v", k99, buckets = 128,
        threshold = 1000)
    }
    println(s"[select-rehearsal]   p99=$p99 rounds=$r99")

    // contender 1: Spark's exact percentile aggregate (value-count
    // map per aggregator — the single-JVM memory wall). percentile()
    // interpolates at position q·(n−1)+1, so query the q that lands
    // exactly on rank k50; FP placement of q can still interpolate an
    // epsilon toward the next value, hence the tolerance.
    val qExact = (k50 - 1).toDouble / (n - 1).toDouble
    val (aggMed, _) = timed("built-in exact percentile aggregate") {
      vals.agg(expr(s"percentile(v, ${qExact}d)")).head().getDouble(0)
    }
    require(math.abs(aggMed - med) < 1e-9,
      s"exact percentile disagrees: $aggMed vs $med")

    // contender 2: the literal ORDER BY + row_number plan — a global
    // sort whose final rank pass is ONE task; run at sortN rows
    val small = vals.limit(sortN.toInt).repartition(32)
      .localCheckpoint()
    val kSmall = sortN / 2
    val ((smallMed, rs), _) = timed(
      s"kthSmallest median (N=$sortN, thr=1000)") {
      DistributedSelect.kthSmallest(small, "v", kSmall, buckets = 128,
        threshold = 1000)
    }
    val (sortMed, _) = timed(s"global-sort row_number median (N=$sortN)") {
      import org.apache.spark.sql.expressions.Window
      small.withColumn("_rn",
          row_number().over(Window.orderBy(col("v"))))
        .filter(col("_rn") === kSmall)
        .head().getDouble(0)
    }
    require(sortMed == smallMed,
      s"sort median disagrees: $sortMed vs $smallMed (rounds=$rs)")

    // GROUPED selection: the groupedWeightedQuantile claim is that
    // scan rounds are the MAX over groups, not the sum — a thousand
    // groups cost the same scans as one. Groups sized exponentially
    // (2^0 .. 2^19 rows per 1M-id block) so per-group round needs
    // genuinely differ; the contender is the honest alternative, one
    // kthSmallest run PER group (the "sum over groups" cost).
    val grouped = vals
      .withColumn("g", floor(log2(pmod(
        monotonically_increasing_id(), lit(1048576L)) + lit(1L)))
        .cast("string"))
      .localCheckpoint()
    val ((gdf, gRounds), _) = timed(
      s"groupedWeightedQuantile median (N=$n, 21 groups)") {
      DistributedSelect.groupedWeightedQuantileWithRounds(
        grouped.withColumn("w", lit(1L)), "g", "v", "w", 0.5,
        buckets = 128, threshold = 1000)
    }
    val gMed = gdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    println(s"[select-rehearsal]   groups=${gMed.size} " +
      s"sharedRounds=$gRounds")
    val (loopMed, _) = timed("per-group kthSmallest loop (the sum)") {
      gMed.keys.toSeq.sorted.map { g =>
        val sub = grouped.filter(col("g") === g)
        val kg = math.max(1L, math.ceil(0.5 * sub.count()).toLong)
        g -> DistributedSelect.kthSmallest(sub, "v", kg,
          buckets = 128, threshold = 1000)
      }.toMap
    }
    val loopRounds = loopMed.values.map(_._2).sum
    loopMed.foreach { case (g, (m, _)) =>
      require(m == gMed(g), s"group $g disagrees: $m vs ${gMed(g)}")
    }
    println(s"[select-rehearsal]   per-group loop total rounds=" +
      s"$loopRounds (vs shared $gRounds)")

    // Flat many-group case: the loop's cost is LINEAR in G (every
    // group pays its own count + rounds + resolve scans) while the
    // grouped form's scan count is flat in G — the crossover the
    // operator exists for. G equal-sized groups at n/5 rows.
    val flatG = args.lift(2).map(_.toInt).getOrElse(200)
    val nf = n / 5
    val flat = spark.range(nf).select(
      (-log((abs(xxhash64(col("id"))) % lit(1000000000L) + lit(1L))
        .cast("double") / lit(1000000001.0))).as("v"),
      pmod(xxhash64(col("id") * lit(7L)), lit(flatG.toLong))
        .cast("string").as("g"),
      lit(1L).as("w"))
      .localCheckpoint()
    val ((fdf, fRounds), _) = timed(
      s"groupedWeightedQuantile median (N=$nf, G=$flatG)") {
      DistributedSelect.groupedWeightedQuantileWithRounds(
        flat, "g", "v", "w", 0.5, buckets = 128, threshold = 1000)
    }
    val fMed = fdf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    println(s"[select-rehearsal]   groups=${fMed.size} " +
      s"sharedRounds=$fRounds")
    val (fLoop, _) = timed(
      s"per-group kthSmallest loop (G=$flatG, the sum)") {
      fMed.keys.toSeq.sorted.map { g =>
        val sub = flat.filter(col("g") === g)
        val kg = math.max(1L, math.ceil(0.5 * sub.count()).toLong)
        g -> DistributedSelect.kthSmallest(sub, "v", kg,
          buckets = 128, threshold = 1000)
      }.toMap
    }
    fLoop.foreach { case (g, (m, _)) =>
      require(m == fMed(g), s"flat group $g disagrees: $m vs ${fMed(g)}")
    }

    println(s"[select-rehearsal] done: N=$n rounds(median)=$r50 " +
      s"rounds(p99)=$r99")
    spark.stop()
  }
}
