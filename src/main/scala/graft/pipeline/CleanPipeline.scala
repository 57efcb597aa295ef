package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** One instrumented cleaning run: the cleaned frame plus the per-stage
  * kept-row counters. `dropped(stage)` is derivable by differencing —
  * input−quality = failed the gate, quality−exact = exact dups,
  * exact−unique = near-dup non-representatives. */
final case class CleanRun(cleaned: DataFrame, input: Observation,
                          quality: Observation, exact: Observation,
                          unique: Observation)

/** The production cleaning composition — quality gate → exact dedup →
  * LSH-verified near-dup clusters → anti-join (the llm_clean_cc
  * semantics) — instrumented with per-stage kept/dropped counters via
  * Spark's Observation API: the counters ride along as accumulators on
  * actions the pipeline ALREADY runs, never as extra count() jobs.
  *
  * Placement is load-bearing. A CollectMetrics node double-counts if
  * its subtree executes more than once in an action, and this pipeline
  * forks twice: exactDedup self-joins its input, and the deduped frame
  * feeds both the pair generation and the final anti-join. Each fork
  * point is therefore `localCheckpoint`ed, which (a) cuts the observed
  * prefix out of the re-executed subtrees so every counter fires
  * exactly once, and (b) stops recomputing the scan→gate→dedup prefix
  * once per consumer (~4× in the un-instrumented form) — the same
  * materialize-at-reuse trade connectedComponents already makes per
  * round. At 100 TB the checkpoint is corpus-sized executor-local
  * storage; the alternative is 4 full recomputations of the prefix. */
object CleanPipeline {

  def ccWithCounters(docs: DataFrame,
                     threshold: Double = 0.6): CleanRun = {
    val in = Observation()
    val q = Observation()
    val ex = Observation()
    val un = Observation()
    // linear chain: in and q are single-consumer up to the checkpoint,
    // and fire during its materialization
    val quality = docs.observe(in, count(lit(1)).as("rows"))
      .filter(TextStats.isQuality(col("text")))
      .observe(q, count(lit(1)).as("rows"))
      .localCheckpoint()
    // ex sits ABOVE the dedup self-join (which re-reads the quality
    // checkpoint, not the observed prefix) and fires during THIS
    // checkpoint's materialization
    val exact = Dedup.exactDedup(quality, "doc_id", "text")
      .observe(ex, count(lit(1)).as("rows"))
      .localCheckpoint()
    val pairs = Dedup.lshVerifiedJaccardPairs(exact, "doc_id", "text",
      threshold)
    val nonRep = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    // no broadcast hint: the non-representative set is O(near-dup
    // count), unbounded at 100 TB — AQE broadcasts when it fits.
    // un fires on the caller's one real action; callers appending
    // orderBy+limit still count every row (TakeOrderedAndProject
    // consumes the full input — a bare limit would short-circuit).
    val cleaned = exact.join(nonRep, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .observe(un, count(lit(1)).as("rows"))
    CleanRun(cleaned, in, q, ex, un)
  }
}
