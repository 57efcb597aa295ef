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
  * The precondition is VERIFIED AT RUNTIME, inside the plan, via two
  * independently sufficient proofs; if neither holds the query throws
  * instead of silently returning a non-exact top-k (a skew shift in
  * production data degrades loudly, never corrupts):
  *
  *   - COVERAGE: sum of the recounted candidate frequencies equals N.
  *     Then no distinct item is absent from the candidate set at all,
  *     the recount IS the complete histogram, and its top-k (even a
  *     sub-k result — the stream simply has fewer than k distinct
  *     items) is exact unconditionally.
  *   - BOUND (full k rows only): the k-th returned frequency satisfies
  *     tf·(m+1) > N. Any item missing from the candidates has true
  *     frequency ≤ N/(m+1) < kth_tf, so nothing absent could displace
  *     or tie into the returned k — including exact ties, since an
  *     equal count would itself exceed the sketch bound and thus be
  *     present.
  *
  * A sub-k result WITHOUT coverage is never exact-provable: Misra–
  * Gries' decrement-all step can evict down to fewer than k surviving
  * slots while distinct items are missing (stream a,b,c,d with m=2
  * leaves only {d}), and any missing item — frequency ≥ 1 — would
  * belong in a top-k that is not full; such a result throws.
  * MisraGriesSpec proves the inclusion guarantee adversarially, the
  * loud failure on uniform data, and the sub-k eviction case;
  * d29_heavy_hitters checks the end result hash-exact against the
  * plain SQL top-k.
  */
object HeavyHitters {

  /** Exact top-k of `itemCol` by frequency (ties broken by item
    * ascending). `sketchSize` (= Misra–Gries m) bounds sketch state
    * and must be ≥ k; exactness requires the candidates to cover the
    * whole stream OR the k-th item's frequency to exceed
    * N/(sketchSize+1), and the plan throws if neither holds. */
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
    val recount = items
      .join(broadcast(candidates), Seq("item"))
      .groupBy("item", "_n").agg(count(lit(1)).as("tf"))
    // coverage proof computed over the FULL ≤ m-row recount frame,
    // BEFORE the top-k truncation: sum(tf) == N iff every stream
    // occurrence hit a candidate, i.e. no distinct item is absent
    val all = Window.partitionBy(lit(1))
    val top = recount
      .withColumn("_covered", sum(col("tf")).over(all))
      .orderBy(col("tf").desc, col("item").asc).limit(k)
    // these windows run over the ≤ k returned rows only; the guard is
    // the expression the OUTPUT tf flows through (not a side-channel
    // assert column the optimizer could prune), so a violated bound
    // cannot produce a row
    top
      .withColumn("_kth", min(col("tf")).over(all))
      .withColumn("_rows", count(lit(1)).over(all))
      .select(col("item"),
        when(col("_covered") === col("_n") ||
            (col("_rows") >= k &&
             col("_kth") * (sketchSize + 1) > col("_n")), col("tf"))
          .otherwise(raise_error(concat(
            lit("exactTopK guarantee violated: candidates cover "),
            col("_covered"), lit(" of N="), col("_n"),
            lit(" occurrences and k-th frequency "),
            col("_kth"), lit(s" <= N/(m+1) with m=$sketchSize"),
            lit(" - raise sketchSize"))))
          .as("tf"))
      .orderBy(col("tf").desc, col("item").asc)
  }

  /** Portable Count–Min sketch (Cormode & Muthukrishnan 2005): `depth`
    * salted md5 hash rows × `width` buckets, each cell the exact count
    * of items landing there — the POINT-ESTIMATE sketch next to
    * [[exactTopK]]'s set sketch: Misra–Gries answers "which items are
    * frequent", Count–Min answers "roughly how frequent is THIS item"
    * for any item, from depth·width bounded cells, with the one-sided
    * guarantee est ≥ true (collisions only ever add).
    *
    * Shape at scale: one pass over the items (a `depth`-way explode,
    * then a groupBy whose key space is ≤ depth·width — map-side
    * combine collapses each partition to the cell table first, so the
    * shuffle carries cells, never items). The salted bucket hash is
    * the portable md5 (`'s<r>:' || item`), so a SQL oracle recomputes
    * every cell exactly. Returns (r, b, c) — at most depth·width rows. */
  def countMinTable(items: DataFrame, itemCol: Column,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (got $depth)")
    require(width >= 2 && width <= (1 << 20),
      s"width must be in [2, 2^20] (got $width)")
    items.select(explode(array(cmCells(itemCol, depth, width): _*))
        .as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
  }

  /** Point estimates from a [[countMinTable]] for the (unique) items
    * of `queries`: est = min over the item's depth cells, with absent
    * cells counting 0 (a LEFT join — an item whose cell no item ever
    * touched estimates from the zero cell, the textbook semantics).
    * Query frames are report-grade (top-k lists, audit samples);
    * the join is cells ⋈ queries·depth — bounded both sides. Returns
    * EVERY row of `queries` plus `est_count` — a NULL item has no
    * cells and comes back with a NULL estimate, never a silently
    * dropped row (round-11 review). */
  def countMinEstimates(cms: DataFrame, queries: DataFrame,
                        itemCol: Column, depth: Int = 4,
                        width: Int = 1024): DataFrame = {
    val est = queries
      .select(itemCol.cast("string").as("_item"))
      .filter(col("_item").isNotNull)
      .distinct()
      .select(col("_item"),
        explode(array(cmCells(col("_item"), depth, width): _*))
          .as("rb"))
      .select(col("_item"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(cms, Seq("r", "b"), "left")
      .groupBy("_item")
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
    queries.join(est, itemCol.cast("string") === col("_item"), "left")
      .drop("_item")
  }

  /** The shared CMS cell derivation: row r's bucket is the portable
    * 60-bit md5 of `"s<r>:" || item`, mod width — ONE definition so
    * the build and query sides cannot drift. */
  private def cmCells(itemCol: Column, depth: Int,
                      width: Int): Seq[Column] =
    (0 until depth).map { r =>
      struct(lit(r.toLong).as("r"),
        pmod(Dedup.md5Long60(
            concat(lit(s"s$r:"), itemCol.cast("string"))),
          lit(width.toLong)).as("b"))
    }
}
