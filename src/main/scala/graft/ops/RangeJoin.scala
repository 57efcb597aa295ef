package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval) join: pairs where
  * `right.ts ∈ [left.ts - width, left.ts]` and the equi-keys match.
  *
  * Naive formulations plan a cartesian/nested-loop join with an
  * inequality filter — O(n·m) per key and unusable at scale. This
  * implementation buckets time into `width`-sized bins and explodes the
  * LEFT side to its two candidate bins (a right row in range must live
  * in the left row's bin or the previous one), turning the range join
  * into a plain equi-join on (keys, bin) followed by the exact range
  * predicate. Cost: 2× the left rows through one hash join — no range
  * explosion, no cross product (guarded by PlanDisciplineSpec's
  * no-cartesian rule like every query).
  */
object RangeJoin {

  /** `tsCol` must be a monotone numeric column (e.g. epoch ns) present
    * on both sides; `width` in the same unit. Right-side columns are
    * expected to be pre-selected/renamed to avoid clashes. */
  def withinRange(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, width: Long): DataFrame = {
    require(width > 0)
    // integer `div`, never `/`: epoch-ns magnitudes exceed 2^53 and the
    // double division would corrupt bin ids
    val lBin = expr(s"$leftTs div ${width}L")
    val rBin = expr(s"$rightTs div ${width}L")
    val lb = left.withColumn("_bin", explode(array(lBin - 1, lBin)))
    val rb = right.withColumn("_bin", rBin)
    lb.join(rb, keys :+ "_bin")
      .filter(col(rightTs) >= col(leftTs) - width &&
        col(rightTs) <= col(leftTs))
      .drop("_bin")
  }

  /** INTERVAL × INTERVAL overlap join: pairs whose closed intervals
    * [leftStart, leftEnd] and [rightStart, rightEnd] overlap
    * (lStart ≤ rEnd ∧ rStart ≤ lEnd) and the equi-keys match — the
    * sessions-versus-windows join ([[withinRange]] handles
    * point-in-range; this handles range-against-range).
    *
    * Same no-cartesian discipline: BOTH sides explode to the
    * `binWidth`-sized bins their interval covers, the join is a plain
    * equi-join on (keys, bin), the exact overlap predicate filters,
    * and a distinct collapses the multi-bin double-counts (a pair
    * overlapping across b bins matches in every shared bin). Pick
    * binWidth near the typical interval length: cost is
    * Σ(span/binWidth + 1) exploded rows per side. A single interval
    * spanning more than `maxBinsPerRow` bins fails IN THE PLAN via
    * raise_error (the exactTopK in-plan-guard convention) rather than
    * silently exploding the join — callers with one giant interval
    * should split it upstream, not widen the guard. Inverted
    * (end < start) intervals also fail there. Both frames must carry
    * a unique id among `outCols`; output = outCols, distinct. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  binWidth: Long, outCols: Seq[String],
                  maxBinsPerRow: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerRow >= 2,
      s"maxBinsPerRow must be >= 2 (got $maxBinsPerRow)")
    def bins(s: String, e: String): Column = {
      val lo = expr(s"$s div ${binWidth}L")
      val hi = expr(s"$e div ${binWidth}L")
      when(col(e) < col(s), raise_error(concat(
        lit(s"overlapJoin: inverted interval ($s > $e): "),
        col(s), lit(" > "), col(e))))
        .when(hi - lo >= maxBinsPerRow, raise_error(concat(
          lit(s"overlapJoin: interval spans >= $maxBinsPerRow bins "),
          lit(s"of $binWidth - split it upstream or raise binWidth"))))
        .otherwise(sequence(lo, hi))
    }
    val lb = left.withColumn("_bin", explode(bins(lStart, lEnd)))
    val rb = right.withColumn("_bin", explode(bins(rStart, rEnd)))
    lb.join(rb, keys :+ "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .select(outCols.map(col): _*)
      .distinct()
  }
}
