package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation & monitoring operators for a training-data pipeline:
  * the measurements run AGAINST the corpus and its quality signals —
  * does a score actually separate good from bad (ROC-AUC), and has a
  * distribution drifted between two corpus segments or snapshots
  * (PSI)? Both are exact, integer-disciplined, and engine-replayable;
  * neither moves data-sized state to the driver.
  */
object Eval {

  /** Exact ROC-AUC of `score` against binary `label` (1 = positive),
    * tie-aware (midrank / Mann–Whitney U): one row
    * (auc, n_pos, n_neg).
    *
    * Shape at scale: one groupBy collapses the corpus to its DISTINCT
    * score values (map-side combine first); the running
    * negatives-below sum is a window over THAT value-distinct frame —
    * its single partition is bounded by score cardinality, not corpus
    * rows. For continuous scores quantize first (e.g. the house
    * `round(score·1e6)` micro discipline) so the distinct frame stays
    * bounded; every pipeline score in this repo is already discrete.
    * The U statistic is pure integer arithmetic (2U avoids the tie
    * half-unit), so the only float is the final division.
    *
    * Degenerate-label contract: with a single-class input (n_pos = 0
    * or n_neg = 0) ranking quality is undefined — `auc` comes back
    * NULL (never NaN: NaN orders and JSON-serializes inconsistently
    * downstream), with n_pos/n_neg still reported for diagnosis. */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val pts = df.select(score.as("s"),
      when(label === 1, 1L).otherwise(0L).as("y"))
    val g = pts.groupBy("s").agg(
      sum(col("y")).as("pos"),
      (count(lit(1)) - sum(col("y"))).as("neg"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val u2 = g
      .withColumn("neg_below", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(lit(2L) * col("neg_below") * col("pos") +
        col("neg") * col("pos")).as("u2"),
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    u2.select(
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"),
      col("n_pos"), col("n_neg"))
  }

  /** Population Stability Index between segment `segA`'s and `segB`'s
    * distributions over `bucket`, in integer micro-units: one row
    * (psi_micro, n_a, n_b, n_buckets). The standard drift monitor
    * between corpus snapshots, sources, or time slices
    * (PSI < 0.1 stable, > 0.25 drifted — ×1e6 here).
    *
    * Laplace-smoothed over the OBSERVED bucket set ((c+1)/(n+B), B =
    * buckets seen in either segment) so empty cells are defined and
    * both engines agree without epsilon conventions. Per-bucket terms
    * quantize to integer micro-units BEFORE the sum (the d28
    * discipline — ln()'s last-ulp spread never reaches the result).
    *
    * Shape at scale: one segment-filtered groupBy on the bucket
    * (map-side combine), a bucket-cardinality-sized frame joined to
    * its own 1-row totals on a constant key (attribute-dependent so
    * constant folding cannot re-plan a nested-loop join), one final
    * sum. The corpus is scanned once. */
  def psiMicro(df: DataFrame, bucket: Column, segment: Column,
               segA: String, segB: String): DataFrame =
    psiFromCounts(df.filter(segment.isin(segA, segB))
      .groupBy(bucket.as("bucket"))
      .agg(sum(when(segment === segA, 1L).otherwise(0L)).as("ca"),
        sum(when(segment === segB, 1L).otherwise(0L)).as("cb")))

  /** The PSI arithmetic over a prebuilt (bucket, ca, cb) histogram
    * frame — shared by the two-segment batch form and the streaming
    * drift monitor so the smoothing/quantization cannot drift. */
  private def psiFromCounts(h: DataFrame): DataFrame = {
    val totals = h.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("nbuckets"))
      .withColumn("_one", pmod(col("nbuckets"), lit(1L)).cast("int"))
    val terms = h
      .withColumn("_one", pmod(col("ca") + col("cb"), lit(1L)).cast("int"))
      .join(broadcast(totals), "_one")
      .select(col("na"), col("nb"), col("nbuckets"),
        ExprUtils.let((col("ca") + 1).cast("double") /
          (col("na") + col("nbuckets"))) { p =>
          ExprUtils.let((col("cb") + 1).cast("double") /
            (col("nb") + col("nbuckets"))) { q =>
            round(lit(1e6) * (p - q) * log(p / q)).cast("long")
          }
        }.as("term"))
    terms.groupBy("na", "nb", "nbuckets")
      .agg(sum(col("term")).as("psi_micro"))
      .select(col("psi_micro"), col("na").as("n_a"), col("nb").as("n_b"),
        col("nbuckets").as("n_buckets"))
  }

  /** The reference side of the drift monitor: the pinned-once
    * histogram a stream (or a nightly batch job) scores every arrival
    * against. Exposed so batch and stream share one construction. */
  def referenceHistogram(reference: DataFrame, bucket: Column): DataFrame =
    reference.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cb"))

  /** PSI of one arriving frame against a prebuilt reference histogram
    * — the EXACT computation [[psiDriftStream]]'s foreachBatch sink
    * runs per micro-batch, exposed as a batch operator so the gate's
    * semantics are oracle-checkable outside a streaming harness. The
    * histogram domain is the FULL OUTER join of the two bucket sets
    * (buckets seen on either side enter the smoothed PSI, missing
    * cells count 0), then the shared [[psiFromCounts]] arithmetic. */
  def psiAgainstReference(batch: DataFrame, refH: DataFrame,
                          bucket: Column): DataFrame = {
    val bh = batch.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("ca"))
    val h = bh.join(refH, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    psiFromCounts(h)
  }

  /** Streaming drift monitor: every micro-batch's `bucket`
    * distribution is PSI-scored against a REFERENCE corpus's
    * histogram (built and pinned once — the reference is never
    * re-scanned), and one (batch_id, psi_micro, n_a, n_b, n_buckets)
    * row goes to `sink` per batch. The alerting-side companion of
    * [[psiMicro]]: same smoothing, same quantization, via the shared
    * arithmetic ([[psiAgainstReference]] — the sink body IS the batch
    * operator, so the two forms cannot drift). Buckets observed in
    * EITHER side enter the smoothed domain, exactly as the batch
    * form. */
  def psiDriftStream(docs: DataFrame, reference: DataFrame,
                     bucket: Column)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val refH = referenceHistogram(reference, bucket).localCheckpoint()
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        sink(psiAgainstReference(batch, refH, bucket)
          .withColumn("batch_id", lit(batchId)))
      }
      .start()
  }
}
