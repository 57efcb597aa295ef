package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT distributed selection (k-th smallest / exact quantiles)
  * without a global sort — the classic iterative range-narrowing
  * scheme (Blum-style selection re-expressed for a cluster):
  *
  *   1. one aggregation pass counts rows per equi-width cell over the
  *      current [lo, hi] candidate range (B cells — a B-row result,
  *      never data on the driver);
  *   2. the cell containing the running k-th is found driver-side from
  *      those B counts; [lo, hi] narrows to that cell, k adjusts by
  *      the mass below it;
  *   3. repeat until the candidate cell holds ≤ `threshold` rows, then
  *      ONE bounded top-k (TakeOrderedAndProject — per-partition
  *      heaps) resolves the exact value.
  *
  * Each round is a full scan with a pushable range predicate and a
  * tiny aggregate — no shuffle of data rows, no window, nothing
  * data-sized on the driver. Rounds are log_B(n/threshold): 4 scans
  * reach the exact median of 10^12 rows at B = 128 — versus the
  * O(n log n) global sort an `ORDER BY ... LIMIT k OFFSET` plans. The
  * answer is a VALUE of the column (the k-th order statistic of the
  * multiset), so tie order cannot affect it and both engines agree
  * bit-for-bit with no interpolation convention.
  *
  * Nulls and NaNs are excluded (order statistics over the comparable
  * values — the quantile convention every SQL engine shares).
  * ±Infinity IS comparable and stays in the multiset: its masses are
  * counted in the head pass and resolved directly, so infinite
  * endpoints never enter the equi-width cell arithmetic.
  */
object DistributedSelect {

  /** The exact k-th smallest (1-based) value of `valueCol` cast to
    * double, with the per-round narrowing trace: returns
    * (value, rounds). */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long,
                  buckets: Int = 128,
                  threshold: Long = 100000): (Double, Int) = {
    require(k >= 1, "k must be >= 1")
    require(buckets >= 2, "buckets must be >= 2")
    require(threshold >= 1 && threshold <= Int.MaxValue,
      s"threshold must be in [1, Int.MaxValue] (got $threshold): the " +
        "bounded resolve materializes up to threshold rows via limit()")
    val v = col(valueCol).cast("double")
    val all = df.select(v.as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))

    // ±Infinity is a legitimate member of the ordered multiset but
    // poisons equi-width cells (width = Inf → NaN boundaries), so the
    // head pass counts the infinite masses separately: if k lands in
    // either mass the answer IS that infinity; otherwise narrowing
    // runs over the finite values with k shifted past the -Inf mass.
    val finite = col("_v") > Double.NegativeInfinity &&
      col("_v") < Double.PositiveInfinity
    val head = all.agg(
      min(when(finite, col("_v"))), max(when(finite, col("_v"))),
      count(when(finite, lit(1))),
      count(when(col("_v") === Double.NegativeInfinity, lit(1))),
      count(when(col("_v") === Double.PositiveInfinity, lit(1))))
      .head()
    val nFinite = head.getLong(2)
    val nNegInf = head.getLong(3)
    val nPosInf = head.getLong(4)
    require(nFinite + nNegInf + nPosInf >= k,
      s"k=$k exceeds non-null row count")
    if (k <= nNegInf) return (Double.NegativeInfinity, 0)
    if (k > nNegInf + nFinite) return (Double.PositiveInfinity, 0)
    val vals = all.filter(finite)
    var lo = head.getDouble(0)
    var hi = head.getDouble(1)
    var kk = k - nNegInf
    var inRange = nFinite
    var rounds = 0

    // Narrow while the candidate set is big and the range can split.
    // Guard: equi-width cells over [lo, hi] use the SAME formula for
    // counting and for the next round's filter, so a row can never
    // fall between rounds.
    while (inRange > threshold && lo < hi && rounds < 64) {
      rounds += 1
      val width = (hi - lo) / buckets
      val cellOf = least(lit(buckets - 1L), greatest(lit(0L),
        floor((col("_v") - lit(lo)) / lit(width)).cast("long")))
      val counts: Array[Row] = vals
        .filter(col("_v") >= lo && col("_v") <= hi)
        .groupBy(cellOf.as("_c")).agg(count(lit(1)).as("_n"))
        .collect() // B rows max — a stats fetch, not a data collect
      val byCell = counts.map(r => r.getLong(0) -> r.getLong(1)).toMap
      var c = 0L
      var below = 0L
      while (c < buckets && below + byCell.getOrElse(c, 0L) < kk) {
        below += byCell.getOrElse(c, 0L)
        c += 1
      }
      kk -= below
      inRange = byCell.getOrElse(c, 0L)
      val newLo = lo + c * width
      val newHi = if (c == buckets - 1) hi else lo + (c + 1) * width
      // all remaining candidates share one double value (or FP width
      // underflow): the k-th of identical values is that value
      if (newLo >= newHi || newLo == lo && newHi == hi) {
        lo = newLo; hi = newLo
      } else {
        lo = newLo; hi = newHi
      }
    }
    if (lo == hi) return (lo, rounds)
    // bounded resolve: top-kk of the surviving range via per-partition
    // heaps; kk <= inRange <= threshold
    val kth = vals.filter(col("_v") >= lo && col("_v") <= hi)
      .orderBy(col("_v").asc).limit(kk.toInt)
      .agg(max(col("_v"))).head().getDouble(0)
    (kth, rounds)
  }

  /** Exact WEIGHTED k-th smallest: the smallest value v with
    * Σ_{u ≤ v} w(u) ≥ k over positive INTEGER weights (integer so the
    * crossing point is exact — no summation-order drift; a
    * token-count or byte-size weight is the natural caller). Same
    * iterative range narrowing as [[kthSmallest]] with per-cell
    * weight sums driving the descent and per-cell ROW counts bounding
    * the resolve; the bounded resolve takes the first crossing of the
    * running weight over the ≤`threshold` surviving rows (a window
    * over a bounded frame — the rocAuc contract). The answer is a
    * value of the multiset, so tie order cannot affect it. Nulls and
    * NaN values are excluded; rows with null/non-positive weight are
    * rejected loudly (a silent drop would move every quantile).
    * Returns (value, rounds). */
  def weightedKthSmallest(df: DataFrame, valueCol: String,
                          weightCol: String, k: Long,
                          buckets: Int = 128,
                          threshold: Long = 100000): (Double, Int) = {
    require(k >= 1, "k must be >= 1")
    require(buckets >= 2, "buckets must be >= 2")
    require(threshold >= 1 && threshold <= Int.MaxValue,
      s"threshold must be in [1, Int.MaxValue] (got $threshold)")
    val v = col(valueCol).cast("double")
    val w = col(weightCol).cast("long")
    val all = df.select(v.as("_v"), w.as("_w"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
    val finite = col("_v") > Double.NegativeInfinity &&
      col("_v") < Double.PositiveInfinity
    // weight validation rides the same head aggregate (no separate
    // validation scan — at corpus scale an extra full pass just to
    // check weights would double the fixed cost of every quantile)
    val head = all.agg(
      min(when(finite, col("_v"))), max(when(finite, col("_v"))),
      coalesce(sum(when(finite, col("_w"))), lit(0L)),
      coalesce(sum(when(col("_v") === Double.NegativeInfinity,
        col("_w"))), lit(0L)),
      coalesce(sum(when(col("_v") === Double.PositiveInfinity,
        col("_w"))), lit(0L)),
      count(when(finite, lit(1))),
      count(when(col("_w").isNull || col("_w") <= 0, lit(1)))).head()
    require(head.getLong(6) == 0,
      "weights must be positive integers (null/<=0 found)")
    val wFinite = head.getLong(2)
    val wNegInf = head.getLong(3)
    val wPosInf = head.getLong(4)
    require(wNegInf + wFinite + wPosInf >= k,
      s"k=$k exceeds total weight")
    if (k <= wNegInf) return (Double.NegativeInfinity, 0)
    if (k > wNegInf + wFinite) return (Double.PositiveInfinity, 0)
    val vals = all.filter(finite)
    var lo = head.getDouble(0)
    var hi = head.getDouble(1)
    var kk = k - wNegInf
    var rowsInRange = head.getLong(5)
    var rounds = 0
    while (rowsInRange > threshold && lo < hi && rounds < 64) {
      rounds += 1
      val width = (hi - lo) / buckets
      val cellOf = least(lit(buckets - 1L), greatest(lit(0L),
        floor((col("_v") - lit(lo)) / lit(width)).cast("long")))
      val counts: Array[Row] = vals
        .filter(col("_v") >= lo && col("_v") <= hi)
        .groupBy(cellOf.as("_c"))
        .agg(sum(col("_w")).as("_sw"), count(lit(1)).as("_n"))
        .collect() // B rows max — a stats fetch, not a data collect
      val byCell = counts.map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      var c = 0L
      var below = 0L
      while (c < buckets &&
        below + byCell.get(c).map(_._1).getOrElse(0L) < kk) {
        below += byCell.get(c).map(_._1).getOrElse(0L)
        c += 1
      }
      kk -= below
      rowsInRange = byCell.get(c).map(_._2).getOrElse(0L)
      val newLo = lo + c * width
      val newHi = if (c == buckets - 1) hi else lo + (c + 1) * width
      if (newLo >= newHi || newLo == lo && newHi == hi) {
        lo = newLo; hi = newLo
      } else {
        lo = newLo; hi = newHi
      }
    }
    if (lo == hi) return (lo, rounds)
    // bounded resolve: running weight over the ≤threshold surviving
    // rows (single-partition window over a bounded frame), first
    // crossing of kk
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val kth = vals.filter(col("_v") >= lo && col("_v") <= hi)
      .withColumn("_cw", sum(col("_w")).over(win))
      .filter(col("_cw") >= kk)
      .orderBy(col("_v").asc).limit(1)
      .head().getDouble(0)
    (kth, rounds)
  }

  /** Exact weighted discrete quantile: the value at cumulative-weight
    * position ⌈q·W⌉ — one-row DataFrame (value, w_total, k). */
  def exactWeightedQuantile(df: DataFrame, valueCol: String,
                            weightCol: String, q: Double,
                            buckets: Int = 128,
                            threshold: Long = 100000): DataFrame = {
    require(q > 0 && q <= 1, "q must be in (0, 1]")
    val v = col(valueCol).cast("double")
    val wTotal = df.select(v.as("_v"),
        col(weightCol).cast("long").as("_w"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .agg(coalesce(sum(col("_w")), lit(0L))).head().getLong(0)
    val k = math.max(1L, math.ceil(q * wTotal).toLong)
    val (value, _) = weightedKthSmallest(df, valueCol, weightCol, k,
      buckets, threshold)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((value, wTotal, k)).toDF("value", "w_total", "k")
  }

  /** Exact discrete quantile (the value at 1-based position
    * ⌈q·n⌉ — the lower/"disc" convention, no interpolation): one-row
    * DataFrame (value, n, k) for the oracle-comparable form. (The
    * narrowing-round count is available via [[kthSmallest]]; it is a
    * property of the run, not of the data, so it stays out of the
    * oracle-compared schema.) */
  def exactQuantile(df: DataFrame, valueCol: String,
                    q: Double, buckets: Int = 128,
                    threshold: Long = 100000): DataFrame = {
    require(q > 0 && q <= 1, "q must be in (0, 1]")
    val v = col(valueCol).cast("double")
    val n = df.select(v.as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .count()
    val k = math.max(1L, math.ceil(q * n).toLong)
    val (value, _) = kthSmallest(df, valueCol, k, buckets, threshold)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((value, n, k)).toDF("value", "n", "k")
  }
}
