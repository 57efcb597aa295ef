package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Eval

/** Dev/audit tool: PLANTED-TRUTH scale rehearsal for the celledCums
  * drift family (r14 — the global-value-window watch item's closure,
  * exercised AT the MaxWindowValues contract ceiling, where the old
  * single-partition `Window.orderBy(v)` sort was the 100× wall). The
  * two segments are uniform{1..m} and its shift uniform{1+c..m+c} —
  * distributions whose drift statistics are CLOSED FORMS, so a 4M-
  * distinct-value run audits itself without an oracle job:
  *
  *   - KS:  sup|F_A − F_B| = c/m        → ks_micro = (1e6·c) div m
  *   - W1:  ∫|F_A − F_B| dv = c exactly → w1_micro = 1e6·c
  *     (the cumulative-gap sum telescopes: ramp c(c+1)/2 + plateau
  *     c(m−c) + ramp c(c−1)/2 = c·m, and the micro division by
  *     na·nb = m² is exact)
  *
  * Structural requires, not printouts:
  *  1. the full driftPanel (ks, w1, mw, ad, energy — ONE shared
  *     celled cum pass + five finishes) completes at m = 4 000 000
  *     distinct values (the ceiling; m+c distinct in the union);
  *  2. ks_micro and w1_micro equal their closed forms EXACTLY (the
  *     celled prefix sums are bit-equal to the global-window
  *     definition at a scale the old code paid one sort task for);
  *  3. the order checks hold: mw_z < 0 (A is stochastically
  *     smaller), ad_micro > 0, energy_micro > 0 — a shift is drift
  *     under every lens;
  *  4. the contract stays LOUD: one value past MaxWindowValues, the
  *     guarded totals key raises before the cum machinery grinds.
  *
  * Usage: sbt "runMain graft.DriftRehearsal [mMillions]"
  * Results recorded in PLANS.md ("celledCums scale rehearsal").
  */
object DriftRehearsal {
  def main(args: Array[String]): Unit = {
    val mM = args.headOption.map(_.toInt).getOrElse(4)
    require(mM >= 1, "need at least 1M distinct values")
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
      println(f"[drift] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val m = mM * 1000000L
    val c = 1000L
    require(m + c <= Eval.MaxWindowValues,
      s"union cardinality ${m + c} must sit inside the contract " +
        s"ceiling ${Eval.MaxWindowValues} — the rehearsal probes the " +
        "cap from below (and past it, for the loud-failure check)")
    val df = spark.range(m)
      .select((col("id") + 1L).as("v"), lit(true).as("a"))
      .unionByName(spark.range(m)
        .select((col("id") + 1L + c).as("v"), lit(false).as("a")))

    val panel = timed(s"driftPanel m=${mM}M c=$c") {
      Eval.driftPanel(df, col("v"), col("a"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    }
    panel.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[drift] $k%-14s $v%.1f")
    }
    // require 2: closed forms, exact
    val ksExpect = (1000000L * c) / m
    require(panel("ks_micro") == ksExpect.toDouble,
      s"ks_micro ${panel("ks_micro")} != $ksExpect")
    require(panel("w1_micro") == (1000000L * c).toDouble,
      s"w1_micro ${panel("w1_micro")} != ${1000000L * c}")
    // require 3: every lens calls the shift drift, with the right sign
    require(panel("mw_z") < 0.0, s"mw_z ${panel("mw_z")} should be < 0")
    require(panel("ad_micro") > 0.0, s"ad_micro ${panel("ad_micro")}")
    require(panel("energy_micro") > 0.0,
      s"energy_micro ${panel("energy_micro")}")
    // require 4: one value past the ceiling fails loudly and EARLY
    // (the guarded totals key raises from the broadcast build before
    // the celled machinery grinds a contract-violating frame)
    val over = spark.range(Eval.MaxWindowValues + 1)
      .select(col("id").as("v"),
        (pmod(col("id"), lit(2L)) === 0L).as("a"))
    val loud = timed("past-cap loud failure") {
      try { Eval.ksMicro(over, col("v"),
          when(col("a"), "A").otherwise("B"), "A", "B").collect()
        false }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("") +
          Option(e.getCause).flatMap(c =>
            Option(c.getMessage)).getOrElse("")
        msg.contains("value cardinality") }
    }
    require(loud, "past-cap input must raise the cardinality guard")
    println(s"[drift] PASS: panel exact at ${mM}M distinct values, " +
      "guard loud past the cap")
    spark.stop()
  }
}
