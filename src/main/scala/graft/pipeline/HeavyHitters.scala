package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
  *      include every item with frequency > N/(m+1);
  *   2. recount pass — broadcast the candidate set, semi-join-gate the
  *      stream, and exactly count ONLY candidate occurrences: the
  *      shuffle carries at most m distinct keys (map-side combine
  *      collapses each partition to ≤ m rows first).
  *
  * The result is EXACT top-k (not approximate) whenever the k-th most
  * frequent item's true count exceeds N/(m+1) — size m to the expected
  * head skew (Zipf: c_k ≈ N·H⁻¹/k, so m of a few k·log k is ample) —
  * and the sketch's partition-order nondeterminism never reaches the
  * output because only the candidate SET (not its weights) is used.
  * MisraGriesSpec proves the inclusion guarantee adversarially;
  * d29_heavy_hitters checks the end result hash-exact against the
  * plain SQL top-k.
  */
object HeavyHitters {

  /** Exact top-k of `itemCol` by frequency (ties broken by item
    * ascending). `sketchSize` (= Misra–Gries m) bounds sketch state
    * and must be ≥ k; exactness requires the k-th item's frequency to
    * exceed N/(sketchSize+1). */
  def exactTopK(df: DataFrame, itemCol: Column, k: Int,
                sketchSize: Int): DataFrame = {
    require(k >= 1 && sketchSize >= k,
      s"need sketchSize >= k >= 1, got k=$k m=$sketchSize")
    val items = df.select(itemCol.as("item"))
    val candidates = items
      .agg(MisraGries.agg(sketchSize, col("item")).as("mg"))
      .select(explode(map_keys(col("mg"))).as("item"))
    items
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("item").asc).limit(k)
  }
}
