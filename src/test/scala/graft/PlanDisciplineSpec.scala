package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the physical-plan shapes PLANS.md documents: a regression
  * that un-pushes a filter, drops a broadcast, or turns a top-k into a
  * global sort fails here, not at 100 TB. Runs against the sf0.001
  * fixtures (plan shapes are SF-independent pre-AQE). */
class PlanDisciplineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("scan queries prune columns and push filters") {
    val p = plan("s2_scan_fused_filter")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"),
      s"commit filter not pushed:\n$p")
    assert(!p.contains("l_comment") && !p.contains("value#"),
      "unreferenced columns must not be read")
  }

  test("flagship analyze is scan -> partial agg -> single-partition final agg") {
    val p = plan("q_analyze_metrics")
    assert(p.contains("HashAggregate"))
    assert(p.contains("SinglePartition") || p.contains("Exchange"))
    assert(!p.contains("SortAggregate"), s"hash agg expected:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("export-misses uses broadcast frequency join and top-k, not window+sort") {
    val p = plan("o1_sort_misses")
    assert(p.contains("BroadcastHashJoin"), s"freq join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"report sort must be top-k capped:\n$p")
    assert(!p.contains("WindowExec"))
  }

  test("row-returning verification queries end in TakeOrderedAndProject") {
    Seq("s1_scan_project", "p4_filter_misses", "t7_time_derive",
      "d2_text_stats", "e1_cosine_topk", "d24_dup_spans",
      "e9_quantized_topk", "m4_image_resize", "m7_image_phash",
      "m8_audio_energy", "d31_tokenize_checksum",
      "d30_weighted_reservoir").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
    }
  }

  test("e10 PQ search plans no join at all: codes + literal ADC tables") {
    val p = plan("e10_pq_adc_topk")
    assert(!p.contains("Join"), s"PQ must fold the ADC table into the scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k expected:\n$p")
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q30 funnel: broadcast under the threshold, user-keyed shuffle past it") {
    // NOT a scale-invariant shape: the per-user stage frames grow with
    // user count. Both planner regimes are pinned, each self-contained
    // under an explicit threshold so neither depends on session
    // defaults. Small side fits -> the stage frames broadcast:
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "10485760") {
      val p = plan("q30_funnel")
      assert(p.contains("BroadcastHashJoin"),
        s"fixture-scale funnel stages should broadcast:\n$p")
    }
    // Past the threshold (forced with -1, the 100 TB regime) the
    // planner must fall back to shuffle joins KEYED ON user_id — the
    // stage frames and the event scan then co-partition, and no
    // corpus-sized side ever lands on the driver.
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = plan("q30_funnel")
      assert(!p.contains("BroadcastHashJoin"),
        s"threshold -1 must disable broadcast:\n$p")
      val joins = p.linesIterator
        .filter(l => l.contains("SortMergeJoin") ||
          l.contains("ShuffledHashJoin")).toSeq
      assert(joins.nonEmpty, s"shuffle joins expected at -1:\n$p")
      joins.foreach(l => assert(l.contains("user_id"),
        s"funnel shuffle join must key on user_id, got:\n$l\n$p"))
    }
  }

  test("llm_curate_full keeps the semantic stage an anti-join on the drop set") {
    // The partial-embedding-coverage contract (DedupSpec pins the
    // semantics; this pins the shape): the semantic-dedup stage must
    // reach the plan as a LEFT ANTI join — a semi-join on the kept
    // embeddings would silently drop unembedded docs — and the
    // composition must stay hash-join-only. The production query
    // checkpoints the survivor frame (which erases these joins from
    // its own executed plan), so the audit runs on the SHARED
    // survivor builder the query checkpoints — same lineage by
    // construction (CleanPipeline.curateSurvivors).
    val s = SparkTestSession.spark
    val p = graft.pipeline.CleanPipeline.curateSurvivors(
        s.read.parquet(s"$sf/documents.parquet"),
        s.read.parquet(s"$sf/embeddings.parquet"))
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"semantic drop stage not anti:\n$p")
    assert(p.contains("LeftSemi"), s"signal keeps must be semi joins:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"curate survivors must stay hash-join-only:\n$p")
  }

  test("q35 injects a runtime bloom filter on the fact scan at shuffle scale") {
    // Fixture scale broadcasts the filtered dimension (fine); the 100 TB
    // regime is shuffle join + runtime row-level filtering: the
    // selective orders predicate becomes a bloom filter applied to the
    // lineitem side BEFORE its shuffle. Thresholds opened explicitly so
    // the pin is self-contained (the application side is far below the
    // default 10 GB scan-size gate at fixture scale).
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "10485760",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold" -> "0") {
      val p = plan("q35_bloom_pruned_join")
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"threshold -1 must force the shuffle-join regime:\n$p")
    }
    // and in the default regime the query still plans sanely (broadcast
    // of the filtered dimension, no nested loop)
    val p = plan("q35_bloom_pruned_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q29 retention: user-keyed shuffle join past the broadcast threshold") {
    // same two-regime contract as q30: the first-seen frame is
    // O(users), so at scale it must shuffle on the user key it
    // already carries, reusing the (user, day) dedupe's partitioning
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = plan("q29_retention_cohorts")
      assert(!p.contains("BroadcastHashJoin"),
        s"threshold -1 must disable broadcast:\n$p")
      val joins = p.linesIterator
        .filter(l => l.contains("SortMergeJoin") ||
          l.contains("ShuffledHashJoin")).toSeq
      assert(joins.nonEmpty, s"shuffle join expected at -1:\n$p")
      joins.foreach(l => assert(l.contains("user_id"),
        s"retention join must key on user_id, got:\n$l\n$p"))
    }
  }

  test("d24 gram-frequency join never broadcasts the corpus-sized side") {
    // the document-frequency table is O(distinct grams); a broadcast
    // hint there would OOM the driver at corpus scale. AQE may still
    // CHOOSE broadcast at this toy SF — the guard is that the LOGICAL
    // plan carries no hint (ResolvedHint), so at 100 TB the planner is
    // free to shuffle.
    val lp = SparkEntry.queries("d24_dup_spans")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("ResolvedHint"), s"unexpected broadcast hint:\n$lp")
  }

  test("d51 effective-token joins never move document text") {
    // token counts project ahead of the assignment join, so only
    // (id, group, n_tokens) rows reach any exchange/join — at corpus
    // scale the text column crossing a shuffle would dominate the
    // report's cost
    val df = SparkEntry.queries("d51_effective_tokens")(spark, sf)
    // AdaptiveSparkPlanExec exposes no children, so collect() on the
    // wrapper sees nothing — unwrap to the current physical plan
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = root.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, "expected the assignment join in the plan")
    joins.foreach { j =>
      val names = j.children.flatMap(_.output).map(_.name)
      assert(!names.contains("text"),
        s"document text reaches a join input: $names")
    }
  }

  test("no query plans a cartesian product or nested-loop join") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cross join")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join")
    }
  }

  test("star joins broadcast their dimension sides") {
    assert(plan("q2_broadcast_join_agg").contains("BroadcastHashJoin"))
    assert(plan("q4_dim_rollup").contains("BroadcastHashJoin"))
  }

  test("q3 takes the top-k before any join: no shuffle join in the plan") {
    val p = plan("q3_join_topk")
    assert(p.contains("TakeOrderedAndProject"), s"q3 must be top-k:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q3 must join the 10-row top-k by broadcast only:\n$p")
  }

  test("q12 group top-k runs as partial+final aggregation, not a window sort") {
    val p = plan("q12_group_topk")
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"),
      s"TopK aggregator expected:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
      s"q12 must not fall back to a window:\n$p")
  }

  test("split assignment is map-only into one aggregation (no join)") {
    val p = plan("d16_split_assign")
    assert(p.contains("HashAggregate"), s"d16:\n$p")
    assert(!p.contains("Join"), s"d16 must not join:\n$p")
  }

  test("stratified sample bounds per-stratum state via WindowGroupLimit") {
    val p = plan("d17_stratified_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=n must push a group limit below the window sort:\n$p")
  }

  test("contamination broadcasts the benchmark n-gram side only") {
    val p = plan("d18_contamination")
    assert(p.contains("BroadcastHashJoin"), s"d18:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must stream past a broadcast bench side:\n$p")
  }

  test("tfidf joins hash-build the vocabulary side and bound the per-doc rank") {
    val p = plan("d19_tfidf_topk")
    assert(p.contains("BroadcastHashJoin"), s"d19:\n$p")
    assert(p.contains("WindowGroupLimit"), s"d19 top-k per doc:\n$p")
  }

  test("native as-of plans the custom exec, no union or window") {
    val p = plan("t11_asof_native")
    assert(p.contains("AsOfJoin"), s"custom operator expected:\n$p")
    assert(!p.contains("Union") && !p.contains("Window"),
      s"t11 must not fall back to the union-window encoding:\n$p")
  }

  test("intersect plans as a semi join, not a nested loop") {
    val p = plan("q24_intersect")
    assert(p.contains("LeftSemi"), s"q24:\n$p")
  }

  test("semi/anti joins stay joins (no subquery re-execution shapes)") {
    assert(plan("q13_semi_join").contains("LeftSemi"))
    assert(plan("q14_anti_join").contains("LeftAnti"))
  }

  test("correlated subquery decorrelates to aggregate + join") {
    val p = plan("q18_corr_subquery")
    assert(p.contains("HashAggregate"), s"decorrelated agg expected:\n$p")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"),
      s"decorrelated join expected:\n$p")
  }

  test("kmv sketch runs as partial+final aggregation, no window, no join") {
    val p = plan("q25_kmv_distinct")
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"),
      s"typed aggregator expected:\n$p")
    assert(!p.contains("WindowExec"), s"q25 must not sort partitions:\n$p")
    assert(!p.contains("Join"), s"q25 is a single aggregation:\n$p")
  }

  test("sequence packing is one sharded window, no join") {
    val p = plan("d22_pack_sequences")
    assert(p.contains("Window"), s"per-shard running sum expected:\n$p")
    assert(!p.contains("Join"), s"d22 must not join:\n$p")
  }

  test("trained IVF final probe is a filtered scan + top-k, no join") {
    val p = plan("e6_ivf_trained")
    assert(p.contains("TakeOrderedAndProject"), s"e6 must be top-k:\n$p")
    assert(!p.contains("Join"),
      s"trained centroids are literals — no join in the probe:\n$p")
  }

  test("knn join bounds per-query top-k below the window sort") {
    val p = plan("e8_knn_join")
    assert(p.contains("WindowGroupLimit"),
      s"rnk <= k must push a group limit below the window:\n$p")
  }

  test("d29 sketch pass shuffles no data rows; recount joins broadcast") {
    val p = plan("d29_heavy_hitters")
    // the Misra-Gries global aggregate moves O(m) partials through a
    // single-partition exchange; the only JOIN is the broadcast
    // inner join gating the recount (distinct map keys, so same
    // multiplicity as a semi-join, but it carries N for the in-plan
    // guarantee check) — a shuffle join here would mean the candidate
    // set stopped broadcasting
    assert(p.contains("BroadcastHashJoin"),
      s"recount must broadcast-join the candidate set:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join belongs in the heavy-hitter path:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k expected:\n$p")
  }

  test("d36 entropy is map-only: scan -> project -> top-k, no shuffle") {
    val p = plan("d36_token_entropy")
    // the per-row fold form must never regress to the (doc, token)
    // groupBy the oracle uses — that shape shuffles the whole token
    // stream; per-row it is a pure projection
    assert(p.contains("TakeOrderedAndProject"), s"top-k expected:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("Join") &&
      !p.contains("WindowExec"),
      s"entropy must stay a per-row projection:\n$p")
    // the native kernel keeps the projection INSIDE whole-stage
    // codegen — the declarative HOF fold breaks the codegen stage
    // (bare Project), which is exactly why the native form ships
    assert(p.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")),
      s"entropy projection fell out of whole-stage codegen:\n$p")
  }

  test("d37 containment gate broadcasts the probe; corpus never shuffles as a build side") {
    val p = plan("d37_containment_gate")
    assert(p.contains("BroadcastHashJoin"),
      s"the batch-side prefix must broadcast into the corpus index:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"no unconditioned join belongs in the gate:\n$p")
  }

  test("d35 prefix containment plans only keyed joins and per-doc windows") {
    val p = plan("d35_containment_prefix")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filter must stay equi-join-only:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k expected:\n$p")
  }

  test("window-family queries aggregate without window functions") {
    // q32/q33/q34 must plan as (partial) aggregates over the native
    // session/tumbling/sliding operators — a WindowExec here means the
    // per-row window form snuck back in
    Seq("q32_session_window", "q33_tumbling_window",
      "q34_sliding_window").foreach { q =>
      val p = plan(q)
      assert(!p.contains("WindowExec"), s"$q must not window-sort:\n$p")
      assert(p.contains("HashAggregate") || p.contains("Aggregate"),
        s"$q should aggregate:\n$p")
    }
  }

  test("e12 mines negatives in one scan with no join") {
    val p = plan("e12_hard_negatives")
    // anchors are literals riding an explode; candidates come from the
    // single embeddings scan — any Join means the anchor fetch leaked
    // into the distributed plan
    assert(!p.contains("Join"), s"e12 must be scan+explode+agg:\n$p")
    assert(p.linesIterator.count(_.trim.startsWith("Scan parquet")) <= 1,
      s"e12 should scan embeddings once:\n$p")
  }

  test("e13 broadcasts the centroid side") {
    val p = plan("e13_centroid_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"centroids are a groups-row frame and must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"outlier tail is top-k, not a global sort:\n$p")
  }

  test("q38 z-score pass reads the cached bucket aggregate, not a " +
    "second events scan") {
    // the query function materializes the hourly bucket frame (one
    // row per hour) into the cache during its 1-row stats fetch; the
    // returned projection must read that cache — a FileSourceScan at
    // the top level would mean the fact table is scanned twice
    val df = SparkEntry.queries("q38_anomaly_buckets")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"),
      s"q38 projection must read the persisted buckets:\n$p")
    // the only parquet scan allowed is the one frozen inside the
    // InMemoryRelation's cached-plan description
    val topLevelScans = p.linesIterator
      .takeWhile(!_.contains("InMemoryRelation"))
      .count(_.contains("Scan parquet"))
    assert(topLevelScans === 0,
      s"q38 must not re-scan events outside the cache:\n$p")
  }

  test("q17b windows only over (flag, cell), never the bare 3-value flag") {
    val p = plan("q17b_ntile_bucketed")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"q17b should rank via one bucketed window:\n$p")
    windows.foreach { line =>
      assert(line.contains("_bkt"),
        s"window must partition by the range cell, got:\n$line\n$p")
    }
    assert(p.contains("BroadcastHashJoin"),
      s"stats/offsets must broadcast back, not shuffle the fact side:\n$p")
  }
}
