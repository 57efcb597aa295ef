package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Eval

/** Dev/audit tool: scale rehearsal for the rank/drift statistics
  * family (the SelectRehearsal convention) — synthetic 50M-row frames
  * on local[32], measuring the claims the operators' scaladocs make:
  *
  *   - `spearmanRho`: the (x, y) PAIR-TABLE collapse is the whole
  *     cost model — tie-heavy columns collapse 50M rows to a
  *     few-hundred-row pair table (cheap), near-unique columns leave
  *     the pair table row-sized (the documented worst case, where the
  *     cell-split keeps the rank windows off a single task);
  *   - `wasserstein1Micro`: value-distinct-frame sizing — integer
  *     (quantized) supports stay bounded regardless of N;
  *   - correctness under scale pressure: the tie-heavy Spearman is
  *     checked against the closed form on a planted monotone
  *     relationship (rho = 1 exactly), W1 against a planted +SHIFT
  *     location move (W1 = SHIFT exactly — every quantile moved by
  *     SHIFT, so the integral is SHIFT).
  *
  * Usage: sbt "runMain graft.StatRehearsal [rows]"
  * Results recorded in PLANS.md ("Stat rehearsal").
  */
object StatRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
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

    // deterministic synthetic frames (hash-derived, no rand(): the
    // hashSample discipline), pinned so every contender reads the
    // same rows
    val base = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(1000L)).as("h"))

    // tie-heavy: x on a 50-value grid, y a noisy monotone function of
    // x on a 20-value grid -> pair table <= 1000 rows
    val tied = base.select(
      (col("h") % 50).as("x"),
      ((col("h") % 50) * 2 + (col("h") % 7)).as("y"))
      .localCheckpoint()
    val rTied = timed(s"spearman tie-heavy ($n rows)")(
      Eval.spearmanRho(tied, col("x"), col("y")).head())
    println(s"[rehearsal] tie-heavy rho=${rTied.getDouble(1)} " +
      s"(monotone-plus-bounded-noise: expect ~1)")
    val pairRows = tied.groupBy("x", "y").count().count()
    println(s"[rehearsal] tie-heavy pair-table rows: $pairRows")

    // strictly monotone planted relationship: rho must be EXACTLY 1
    val mono = base.select(col("id").cast("double").as("x"),
      (col("id") * 3 + 1).cast("double").as("y"))
    val rMono = timed(s"spearman near-unique ($n rows — worst case: " +
      "pair table is row-sized)")(
      Eval.spearmanRho(mono, col("x"), col("y")).head())
    require(rMono.getDouble(1) == 1.0,
      s"planted monotone must give rho=1, got ${rMono.getDouble(1)}")
    println(s"[rehearsal] near-unique rho=${rMono.getDouble(1)} ok")

    // Wasserstein: every row contributes one 'a' value AND its +SHIFT
    // twin to 'b', so segment B is EXACTLY segment A's multiset
    // shifted -> W1 = SHIFT by construction, not approximately
    val shift = 37L
    val seg = base.select(explode(array(
        struct(lit("a").as("seg"), (col("h") % 200).as("v")),
        struct(lit("b").as("seg"),
          ((col("h") % 200) + shift).as("v")))).as("r"))
      .select(col("r.seg").as("seg"), col("r.v").as("v"))
    val w1 = timed(s"wasserstein1Micro ($n rows, 200-value support)")(
      Eval.wasserstein1Micro(seg, col("v"), col("seg"), "a", "b")
        .head())
    require(w1.getLong(0) == shift * 1000000L,
      s"planted +$shift shift must give W1=$shift, got ${w1.getLong(0)}")
    println(s"[rehearsal] W1=${w1.getLong(0)} micro " +
      s"(= planted shift $shift) over ${w1.getLong(3)} support values")

    // Mann-Whitney worst case: n DISTINCT pooled values (the value
    // table is row-sized — exactly what the midrank cells exist
    // for), planted DISJOINT ranges: every A value above every B
    // value, so u2_a = 2·na·nb exactly, zero ties, z > 0
    val mw = base.select(
      when(col("id") % 2 === 0, col("id") + n).otherwise(col("id"))
        .cast("double").as("v"),
      (col("id") % 2 === 0).as("a"))
    val rMw = timed(s"mannWhitneyU near-unique ($n rows — worst " +
      "case: value table is row-sized)")(
      Eval.mannWhitneyU(mw, col("v"), col("a")).head())
    val (mwNa, mwNb) = (rMw.getLong(0), rMw.getLong(1))
    require(rMw.getLong(2) == 2L * mwNa * mwNb,
      s"planted disjoint ranges must give u2_a=2·na·nb, got $rMw")
    require(rMw.getLong(3) == 0L, s"no ties planted, got $rMw")
    require(rMw.getDouble(4) > 0,
      s"A strictly above B must give z > 0, got $rMw")
    println(s"[rehearsal] MW u2_a=${rMw.getLong(2)} " +
      s"(= 2*na*nb for na=$mwNa nb=$mwNb) z=${rMw.getDouble(4)} ok")

    // grouped MW: 21 groups resolved in ONE shared pass (a per-group
    // loop would be 21 jobs), same planted disjoint ranges — so
    // within EVERY group u2_a = 2·na·nb exactly, zero ties, z > 0
    val gmw = base.select(
      (col("h") % 21).as("g"),
      when(col("id") % 2 === 0, col("id") + n).otherwise(col("id"))
        .cast("double").as("v"),
      (col("id") % 2 === 0).as("a"))
    val rG = timed(s"groupedMannWhitneyU ($n rows, 21 groups, one " +
      "pass)")(
      Eval.groupedMannWhitneyU(gmw, col("v"), col("a"), col("g"))
        .collect())
    require(rG.length == 21, s"21 groups expected, got ${rG.length}")
    rG.foreach { r =>
      require(r.getLong(3) == 2L * r.getLong(1) * r.getLong(2),
        s"group ${r.get(0)}: planted disjoint ranges must give " +
          s"u2_a=2·na·nb, got $r")
      require(r.getLong(4) == 0L && r.getDouble(5) > 0,
        s"group ${r.get(0)}: no ties planted, z > 0: $r")
    }
    println(s"[rehearsal] grouped MW: all 21 groups exact ok")

    // Welch at scale with a CLOSED-FORM expectation: A two-point
    // {0, 2} (half each), B two-point {10, 14} — exact sums known,
    // expected t/df re-derived through the operator's own
    // single-division IEEE contract from BigInt-exact co-moments
    require(n % 4 == 0, "welch planting needs n divisible by 4")
    val wdf = base.select(
      when(col("id") % 2 === 0,
          when(col("id") % 4 === 0, 0L).otherwise(2L))
        .otherwise(when(col("id") % 4 === 1, 10L).otherwise(14L))
        .as("v"),
      (col("id") % 2 === 0).as("a"))
    val rW = timed(s"welchT ($n rows)")(
      Eval.welchT(wdf, col("v"), col("a")).head())
    val q = BigInt(n / 4)
    val (wNa, wNb) = (2 * q, 2 * q)
    val (sx, sxx) = (2 * q, 4 * q)            // {0,2} halves
    val (sy, syy) = (24 * q, (100 + 196) * q) // {10,14} halves
    val va = (wNa * sxx - sx * sx).doubleValue /
      (wNa * wNa * (wNa - 1)).doubleValue
    val vb = (wNb * syy - sy * sy).doubleValue /
      (wNb * wNb * (wNb - 1)).doubleValue
    val dd = (sx * wNb - sy * wNa).doubleValue /
      (wNa * wNb).doubleValue
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantT = r6(dd / math.sqrt(va + vb))
    val wantDf = r6((va + vb) * (va + vb) /
      (va * va / (wNa - 1).doubleValue +
        vb * vb / (wNb - 1).doubleValue))
    require(rW.getDouble(2) == wantT,
      s"welch t: want $wantT got ${rW.getDouble(2)}")
    require(rW.getDouble(3) == wantDf,
      s"welch df: want $wantDf got ${rW.getDouble(3)}")
    println(s"[rehearsal] Welch t=${rW.getDouble(2)} " +
      s"df=${rW.getDouble(3)} (closed form) ok")

    spark.stop()
  }
}
