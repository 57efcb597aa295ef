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

/** One instrumented curation run (the llm_curate_full composition):
  * the curated frame plus the per-stage set sizes that explain ITS
  * cost — the n-gram keep set, the LM-band keep set, the semantic-dup
  * DROP set, and the survivor count entering exact dedup. When the
  * composition's runtime moves between rounds, these counters (riding
  * the run's own actions) say whether the corpus got denser or the
  * plan got worse — the difference between a regression and a
  * data-shape shift. */
final case class CurateRun(curated: DataFrame, input: Observation,
                           ngramKeep: Observation, bandKeep: Observation,
                           semDrop: Observation, survivors: Observation)

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
    // registered so the bench artifact carries the stage sizes next to
    // the timing (graft.ops.Counters; the drain is non-blocking, so
    // callers that never act on the frame cost nothing)
    def reg(l: String) = graft.ops.Counters.register("llm_clean_cc", l,
      Observation(s"llm_clean_cc_$l"))
    val in = reg("input")
    val q = reg("quality")
    val ex = reg("exact")
    val un = reg("unique")
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

  /** The full-curation composition — corpus-wide signals first (d27's
    * cross-doc dup-n-gram filter, d28's unigram-LM band, e11's
    * semantic-dup drop set), exact dedup LAST over the survivors —
    * instrumented with per-stage set-size counters and checkpointed at
    * its one fork point.
    *
    * The fork point is load-bearing for cost, not just counters:
    * [[Dedup.exactDedup]] SELF-JOINS its input, so an un-checkpointed
    * `filtered` would execute the entire upstream — the 13-gram
    * df-join, the unigram-LM explode+join, the semantic bucket join,
    * and the three doc_id joins — TWICE per action. Checkpointing the
    * survivor frame (corpus-fraction rows, three narrow columns)
    * halves the pipeline and gives every Observation exactly one
    * firing subtree. The drop/keep-set builders themselves are
    * single-consumer join sides inside that one materialization, so
    * their counters need no further isolation. */
  def curateWithCounters(docs: DataFrame, emb: DataFrame,
                         hyperplaneIds: Seq[Long] = Seq(1L, 2L, 3L, 4L),
                         n: Int = 13, maxDupFrac: Double = 0.2,
                         minScoreMicro: Long = -1500000L,
                         minCosine: Double = 0.4): CurateRun = {
    def reg(l: String) = graft.ops.Counters.register("llm_curate_full", l,
      Observation(s"llm_curate_full_$l"))
    val in = reg("input")
    val ng = reg("ngramKeep")
    val bd = reg("bandKeep")
    val sd = reg("semDrop")
    val sv = reg("survivors")
    val filtered = curateSurvivors(docs, emb, hyperplaneIds, n,
      maxDupFrac, minScoreMicro, minCosine,
      observeWith = Some((in, ng, bd, sd, sv)))
    val curated = Dedup.exactDedup(filtered.localCheckpoint(),
      "doc_id", "text")
    CurateRun(curated, in, ng, bd, sd, sv)
  }

  /** Uninstrumented [[curateWithCounters]] — same survivors, same
    * fork-point checkpoint, no Observation registration: for
    * COMPOSITIONS that embed the curation stage as a prefix (the
    * llm_pretrain_full capstone), where registering the standalone
    * entry's counter tag again would double-count its observations. */
  def curate(docs: DataFrame, emb: DataFrame,
             hyperplaneIds: Seq[Long] = Seq(1L, 2L, 3L, 4L),
             n: Int = 13, maxDupFrac: Double = 0.2,
             minScoreMicro: Long = -1500000L,
             minCosine: Double = 0.4): DataFrame =
    Dedup.exactDedup(curateSurvivors(docs, emb, hyperplaneIds, n,
        maxDupFrac, minScoreMicro, minCosine).localCheckpoint(),
      "doc_id", "text")

  /** The survivor frame of the curation composition — signal joins
    * only, BEFORE the fork-point checkpoint — shared by
    * [[curateWithCounters]] (instrumented) and by plan-shape audits
    * (the checkpoint erases the upstream joins from the production
    * query's executed plan, so PlanDisciplineSpec inspects THIS
    * lineage; one builder means the audited shape cannot drift from
    * the shipped one). */
  private[graft] def curateSurvivors(
      docs: DataFrame, emb: DataFrame,
      hyperplaneIds: Seq[Long] = Seq(1L, 2L, 3L, 4L),
      n: Int = 13, maxDupFrac: Double = 0.2,
      minScoreMicro: Long = -1500000L, minCosine: Double = 0.4,
      observeWith: Option[(Observation, Observation, Observation,
        Observation, Observation)] = None): DataFrame = {
    def obs(df: DataFrame,
            pick: ((Observation, Observation, Observation, Observation,
              Observation)) => Observation): DataFrame =
      observeWith.fold(df)(o =>
        df.observe(pick(o), count(lit(1)).as("rows")))
    val keepNgram = obs(Dedup.dupNgramFilter(docs, "doc_id", "text",
        n = n, maxDupFrac = maxDupFrac)
      .select(col("id").as("doc_id")), _._2)
    val band = obs(TextStats.unigramLogProb(docs, "doc_id", "text")
      .filter(col("score_micro") > lit(minScoreMicro))
      .select(col("id").as("doc_id")), _._3)
    val hp = Similarity.vectorsByIds(emb, "vec_id", "embedding",
      hyperplaneIds)
    // anti-join on the DROP set, not semi-join on the kept
    // embeddings: docs without an embedding row (the corpus is only
    // partially embedded) must survive this stage untouched
    val semDrop = obs(Dedup.semanticDupIds(emb, "vec_id", "embedding",
        hp, minCosine = minCosine)
      .select(col("drop_id").as("doc_id")), _._4)
    // no broadcast hints: every keep/drop set is a corpus fraction,
    // unbounded at 100 TB — AQE broadcasts when one actually fits
    obs(obs(docs, _._1)
      .join(keepNgram, Seq("doc_id"), "left_semi")
      .join(band, Seq("doc_id"), "left_semi")
      .join(semDrop, Seq("doc_id"), "left_anti"), _._5)
  }
}
