package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group ranking and ntile WITHOUT a full-partition window
  * sort (SURVEY §7.4 / VERDICT r4: `ntile(4) over partitionBy(flag)`
  * with 3 distinct flags sorts ~⅓ of the table in one task at any
  * scale — the classic low-cardinality-partition scale-killer).
  *
  * Scheme (the textbook distributed selection/ranking shape):
  *
  *   1. per-group min/max/count — one tiny aggregate, broadcast back;
  *   2. range-bucket each row by value into `buckets` equi-width cells
  *      (monotone in the value, ties share a cell, so cross-cell order
  *      agrees with the full (value, tieCols) order);
  *   3. per-(group, cell) counts → cumulative cell offsets. Computed
  *      windowlessly (explode over the 0..B-1 cell ids + filter + sum)
  *      on the B-rows-per-group counts frame, so NO plan node windows
  *      over a bare low-cardinality group key;
  *   4. `row_number` windowed over (group, cell) — groups×B parallel
  *      sort tasks of ~n/B rows each, not one task of n rows;
  *   5. global rank = cell offset + local rank; ntile derives from
  *      (rank, group count) by the SQL-standard formula (first n%k
  *      tiles get the extra row), so the output is bit-identical to
  *      `ntile(k) over (partition by group order by value, tieCols)`.
  *
  * At 100 TB, `buckets` scales with the data (it bounds the per-task
  * sort at n_group/buckets rows); the offsets frame stays at
  * groups×buckets rows regardless of n. Equi-width cells can be
  * unbalanced under extreme value skew — balance only affects task
  * sizing, never correctness, and a percentile-based bucketizer drops
  * in by replacing step 2.
  */
object DistributedRank {

  /** `df` plus an `out` column holding the exact rank (1-based
    * `row_number` order) of each row within `groupCol`, ordered by
    * (`valueCol`, `tieCols`*). Also appends `_grp_n` = group size
    * (callers that don't need it drop it; [[bucketedNtile]] does). */
  def bucketedRank(df: DataFrame, groupCol: String, valueCol: String,
                   tieCols: Seq[String], buckets: Int = 32,
                   out: String = "rank"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val B = buckets.toLong
    val v = col(valueCol).cast("double")

    // Null-safe joins (<=>) throughout: a null group key is a
    // partition like any other to ntile()/row_number(), so it must
    // survive the stats/offsets round-trips, not fall out of an
    // equi-join.
    // pinned: the bucketed frame below has TWO consumers in
    // rankFromCells (the cell counts and the window input), so an
    // un-pinned stats subtree — a full-table aggregation — would
    // execute once per consumer. The frame is |groups| rows; pinning
    // costs one tiny job and halves the stats passes.
    val stats = df.groupBy(col(groupCol).as("_grp_key"))
      .agg(min(v).as("_pmin"), max(v).as("_pmax"),
        count(lit(1)).as("_grp_n"))
      .localCheckpoint()

    // Monotone equi-width cell id: null values get cell -1 — they sort
    // FIRST under Spark's asc (nulls-first) window ordering, so the
    // dedicated leading cell keeps cross-cell order consistent. Ties
    // always share a cell (same double), so cell order respects value
    // order.
    val cell = when(v.isNull, lit(-1L))
      .when(col("_pmax") <=> col("_pmin"), lit(0L))
      .otherwise(least(lit(B - 1L), greatest(lit(0L),
        floor((v - col("_pmin")) /
          ((col("_pmax") - col("_pmin")) / lit(B.toDouble)))
          .cast("long"))))
    val bucketed = df.join(broadcast(stats),
        col(groupCol) <=> col("_grp_key"))
      .drop("_grp_key")
      .withColumn("_bkt", cell)
      .drop("_pmin", "_pmax")
    rankFromCells(bucketed, groupCol, valueCol, tieCols, B, out)
  }

  /** [[bucketedRank]] with PERCENTILE-derived cell boundaries instead
    * of equi-width ones — the drop-in the equi-width scaladoc
    * promises for value-skewed groups. Equi-width cells under a
    * heavy-tailed value (a lognormal quality score, token counts)
    * put most of a group in cell 0 and the per-task sort degenerates
    * back toward the full-partition window; per-group
    * `approx_percentile` boundaries keep cells near-equal REGARDLESS
    * of the value distribution (up to tie mass — identical values
    * must share a cell in any monotone scheme, so a single value
    * holding >1/B of a group still bounds balance).
    *
    * Cell id = #boundaries ≤ v (monotone in v, ties share a cell),
    * so the cross-cell order invariant — and therefore the RANK — is
    * IDENTICAL to the equi-width form; boundary placement only moves
    * task sizing. The boundaries frame is groups×(B−1) doubles,
    * broadcast like the equi-width stats. Sketch accuracy only
    * affects balance, never correctness. */
  def bucketedRankBalanced(df: DataFrame, groupCol: String,
                           valueCol: String, tieCols: Seq[String],
                           buckets: Int = 32,
                           out: String = "rank",
                           accuracy: Int = 1000): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    rankFromCells(balancedCells(df, groupCol, valueCol, buckets, accuracy),
      groupCol, valueCol, tieCols, buckets.toLong, out)
  }

  /** The percentile cell assignment of [[bucketedRankBalanced]]:
    * `df` + `_bkt` + `_grp_n`. Exposed package-private so the balance
    * property (near-equal cell populations under value skew) is
    * directly assertable. */
  private[graft] def balancedCells(df: DataFrame, groupCol: String,
                                   valueCol: String,
                                   buckets: Int,
                                   accuracy: Int = 1000,
                                   sampleMod: Int = 16): DataFrame = {
    val v = col(valueCol).cast("double")
    if (buckets == 1) {
      // degenerate single cell: no boundaries to estimate
      val stats = df.groupBy(col(groupCol).as("_grp_key"))
        .agg(count(lit(1)).as("_grp_n"))
        .localCheckpoint()
      return df.join(broadcast(stats),
          col(groupCol) <=> col("_grp_key"))
        .drop("_grp_key")
        .withColumn("_bkt",
          when(v.isNull, lit(-1L)).otherwise(lit(0L)))
    }
    val qs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    // sketch accuracy trades sketch-build time for cell balance ONLY
    // (cell id = #boundaries <= v stays monotone at any accuracy, so
    // the rank is bit-identical); at accuracy A each cell's population
    // is within ~n/A of its n/B target — A >= ~30·B keeps the spread
    // under a few percent, far below task-sizing relevance
    // pinned for the same two-consumer reason as the equi-width stats
    // — and it matters more here: the percentile sketch is an
    // object-hash aggregate (no whole-stage codegen), the single most
    // expensive piece of the balanced path, and un-pinned it ran once
    // per rankFromCells consumer (the measured bulk of the q17c-vs-
    // q17b driver-bench delta).
    //
    // SAMPLED sketch input (the round-10 close of that residual): the
    // sketch only needs boundary ESTIMATES — Spark's own
    // RangePartitioner picks shuffle bounds from a sample for the
    // same reason — so only ~1/sampleMod of the ROWS feed it. The
    // sample is a seeded rand() per-row filter (the sample() idiom),
    // NOT a hash of the value columns: hashing (group, value, ties)
    // samples distinct value COMBINATIONS wholesale, so a huge
    // low-cardinality group (10M rows over 20 distinct values, empty
    // tieCols) could land zero combos in the sample ~27% of the time
    // and fall back to one cell — the exact skew case this bucketizer
    // exists to avoid (round-10 review catch). Rand is deterministic
    // per task attempt given stable input splits, and boundary
    // placement is allowed to vary anyway: ranks are
    // boundary-independent (the q17c oracle pins that), and the stats
    // frame is localCheckpointed so ONE consistent boundary set
    // serves the whole query.
    //
    // The sketch aggregation is a SEPARATE pass from the exact
    // _grp_n count, on purpose: one TypedImperativeAggregate in a
    // groupBy forces the whole aggregation onto
    // ObjectHashAggregateExec (no whole-stage codegen), so fusing
    // count+sketch made every row pay the object-agg row path.
    // Split, the count stays a codegen'd HashAggregate over all rows,
    // the sketch's object path sees only the 1/sampleMod sample, and
    // the two groups-sized results meet in a tiny join. Balance error
    // grows ~sqrt(sampleMod) on the sampled count — negligible for
    // any group big enough for balance to matter; a group too small
    // to sample (null sketch) falls back to one cell, the cheap case.
    val sketchIn =
      if (sampleMod <= 1) df
      else df.filter(rand(20251015L) < lit(1.0 / sampleMod))
    val cnts = df.groupBy(col(groupCol).as("_grp_key"))
      .agg(count(lit(1)).as("_grp_n"))
    val bnds = sketchIn.groupBy(col(groupCol).as("_bnd_key"))
      .agg(percentile_approx(v, qs, lit(accuracy)).as("_bnds"))
    val stats = cnts.join(bnds, col("_grp_key") <=> col("_bnd_key"),
        "left").drop("_bnd_key")
      .localCheckpoint()
    // count boundaries <= v WITHOUT a higher-order array function
    // (filter/aggregate lambdas are CodegenFallback — one interpreted
    // per-row lambda here broke whole-stage codegen for the entire
    // bucketing projection and cost ~1.5 s at sf0.1). The boundaries
    // are sorted, so the count is a BINARY-SEARCH when-tree over the
    // fixed B-1 slots: each row evaluates ⌈log2 B⌉ short-circuited
    // comparisons (vs B-1 for the unrolled linear sum this replaces),
    // all element_at with literal indices — fully codegen'd. This
    // expression runs once per row per rankFromCells consumer, so its
    // per-row cost is the balanced path's main overhead vs equi-width.
    def leCount(lo: Int, hi: Int): org.apache.spark.sql.Column =
      if (lo > hi) lit(0L)
      else {
        val mid = (lo + hi) / 2
        when(element_at(col("_bnds"), mid) <= v,
          lit((mid - lo + 1).toLong) + leCount(mid + 1, hi))
          .otherwise(leCount(lo, mid - 1))
      }
    // a group whose sample was empty has a null sketch: all its rows
    // share cell 0 (single-cell fallback — it was too small to sample,
    // so it is too small for balance to matter)
    val cell = when(v.isNull, lit(-1L))
      .when(col("_bnds").isNull, lit(0L))
      .otherwise(leCount(1, buckets - 1))
    df.join(broadcast(stats), col(groupCol) <=> col("_grp_key"))
      .drop("_grp_key")
      .withColumn("_bkt", cell)
      .drop("_bnds")
  }

  /** Shared tail of the two bucketizers: per-(group, cell) counts →
    * windowless cumulative offsets → per-cell row_number → global
    * rank. `bucketed` must carry `_bkt` ∈ [-1, B) monotone in the
    * value (ties sharing a cell) and `_grp_n`. */
  private def rankFromCells(bucketed: DataFrame, groupCol: String,
                            valueCol: String, tieCols: Seq[String],
                            B: Long, out: String): DataFrame = {
    val counts = bucketed.groupBy(col(groupCol), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
    // Cumulative offsets without a window: each cell's count
    // contributes to every LATER cell id. B× amplification of a
    // groups×B frame — bounded by B², independent of row count.
    val offsets = counts
      .select(col(groupCol).as("_ogrp"), col("_bkt"), col("_c"),
        explode(sequence(lit(-1L), lit(B - 1L))).as("_obkt"))
      .filter(col("_obkt") > col("_bkt"))
      .groupBy(col("_ogrp"), col("_obkt"))
      .agg(sum(col("_c")).as("_off"))

    val w = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy((col(valueCol) +: tieCols.map(col)).map(_.asc): _*)
    bucketed
      .join(broadcast(offsets),
        col(groupCol) <=> col("_ogrp") && col("_bkt") === col("_obkt"),
        "left")
      .drop("_ogrp", "_obkt")
      .withColumn(out,
        coalesce(col("_off"), lit(0L)) + row_number().over(w))
      .drop("_bkt", "_off")
  }

  /** `df` plus an `out` column bit-identical to
    * `ntile(nTiles) over (partition by groupCol order by valueCol,
    * tieCols*)`, computed from [[bucketedRank]]'s exact rank and the
    * group size: with n = group rows, the first n % k tiles have
    * ⌈n/k⌉ rows and the rest ⌊n/k⌋ (the SQL-standard split). */
  def bucketedNtile(df: DataFrame, groupCol: String, valueCol: String,
                    tieCols: Seq[String], nTiles: Int, buckets: Int = 32,
                    out: String = "ntile",
                    balanced: Boolean = false): DataFrame = {
    require(nTiles >= 1, "nTiles must be >= 1")
    val ranked =
      if (balanced)
        bucketedRankBalanced(df, groupCol, valueCol, tieCols, buckets,
          out = "_rank")
      else bucketedRank(df, groupCol, valueCol, tieCols, buckets,
        out = "_rank")
    val small = floor(col("_grp_n") / lit(nTiles)).cast("long")
    val nbig = col("_grp_n") % lit(nTiles.toLong)
    val tile = {
      val big = small + lit(1L)
      val cut = nbig * big // rows covered by the ⌈n/k⌉-sized tiles
      when(col("_rank") <= cut,
        floor((col("_rank") - 1) / big).cast("long") + 1L)
        .otherwise(nbig +
          floor((col("_rank") - cut - 1) / greatest(small, lit(1L)))
            .cast("long") + 1L)
    }
    ranked.withColumn(out, tile).drop("_rank", "_grp_n")
  }
}
