package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Exact top-k frequent items at corpus scale: sketch-then-recount.
  *
  * d13_vocab_topk's direct `groupBy(token).count()` shuffles the ENTIRE
  * token stream on the token key — at 100 TB that is the largest
  * shuffle in the pipeline, and Zipf skew funnels stopwords into hot
  * reduce tasks. The classic two-pass alternative:
  *
  *   1. sketch pass — a Misra–Gries global aggregate: no shuffle of
  *      data rows at all (map-side partials of O(m) state, one tiny
  *      final merge), yielding ≤ m candidate items that PROVABLY
  *      include every item with frequency > N/(m+1); the same pass
  *      also counts N, so the guarantee is checkable for free;
  *   2. recount pass — broadcast the candidate set, join-gate the
  *      stream, and exactly count ONLY candidate occurrences: the
  *      shuffle carries at most m distinct keys (map-side combine
  *      collapses each partition to ≤ m rows first).
  *
  * The result is EXACT top-k (not approximate) whenever the k-th most
  * frequent item's true count exceeds N/(m+1) — size m to the expected
  * head skew (Zipf: c_k ≈ N·H⁻¹/k, so m of a few k·log k is ample) —
  * and the sketch's partition-order nondeterminism never reaches the
  * output because only the candidate SET (not its weights) is used.
  *
  * The precondition is VERIFIED AT RUNTIME, inside the plan: if the
  * returned k-th frequency fails the strict bound tf·(m+1) > N, the
  * query throws instead of silently returning a non-exact top-k (a
  * skew shift in production data degrades loudly, never corrupts).
  * Soundness of the check: any item missing from the candidates has
  * true frequency ≤ N/(m+1) < kth_tf, so nothing absent could displace
  * or tie into the returned k — including exact ties, since an equal
  * count would itself exceed the sketch bound and thus be present.
  * When fewer than k distinct items come back, the sketch never
  * evicted (≤ m distinct items total) and the result is exact with no
  * bound needed. MisraGriesSpec proves the inclusion guarantee
  * adversarially and the loud failure on uniform data;
  * d29_heavy_hitters checks the end result hash-exact against the
  * plain SQL top-k.
  */
object HeavyHitters {

  /** Exact top-k of `itemCol` by frequency (ties broken by item
    * ascending). `sketchSize` (= Misra–Gries m) bounds sketch state
    * and must be ≥ k; exactness requires the k-th item's frequency to
    * exceed N/(sketchSize+1), and the plan throws if it does not. */
  def exactTopK(df: DataFrame, itemCol: Column, k: Int,
                sketchSize: Int): DataFrame = {
    require(k >= 1 && sketchSize >= k,
      s"need sketchSize >= k >= 1, got k=$k m=$sketchSize")
    val items = df.select(itemCol.as("item"))
    // one pass: the MG candidate map AND the stream length N (the
    // guarantee denominator) from the same global aggregate
    val sketch = items.agg(
      MisraGries.agg(sketchSize, col("item")).as("mg"),
      count(lit(1)).as("_n"))
    val candidates = sketch.select(
      explode(map_keys(col("mg"))).as("item"), col("_n"))
    // inner join, not semi: map keys are distinct so multiplicity is
    // identical, and it carries _n into the recount rows so the bound
    // check stays inside the plan (no second scan, no driver collect)
    val top = items
      .join(broadcast(candidates), Seq("item"))
      .groupBy("item", "_n").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("item").asc).limit(k)
    // the window runs over the ≤ k returned rows only; the guard is
    // the expression the OUTPUT tf flows through (not a side-channel
    // assert column the optimizer could prune), so a violated bound
    // cannot produce a row
    val all = Window.partitionBy(lit(1))
    top
      .withColumn("_kth", min(col("tf")).over(all))
      .withColumn("_rows", count(lit(1)).over(all))
      .select(col("item"),
        when(col("_rows") < k ||
            col("_kth") * (sketchSize + 1) > col("_n"), col("tf"))
          .otherwise(raise_error(concat(
            lit("exactTopK guarantee violated: k-th frequency "),
            col("_kth"), lit(" <= N/(m+1) with N="), col("_n"),
            lit(s" m=$sketchSize - raise sketchSize"))))
          .as("tf"))
      .orderBy(col("tf").desc, col("item").asc)
  }
}
