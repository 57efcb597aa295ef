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
}
