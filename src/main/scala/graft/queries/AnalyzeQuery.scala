package graft.queries

import graft.ops.EventOps
import graft.ops.EventOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed result of the flagship `analyze` query — field-for-field the
  * `AnalysisResult` struct of `cli-go/internal/analyzer/analyzer.go:29-47`
  * / the console metrics of `rime_logger/cli.py:284-309`. */
final case class AnalysisResult(
    totalCommits: Long,
    totalSelections: Long,
    rawInputCommits: Long,
    firstChoiceCount: Long,
    top3Count: Long,
    firstChoiceHitRate: Option[Double],
    top3HitRate: Option[Double],
    averageRank: Option[Double],
    overallAccuracyScore: Option[Double],
    directInputRate: Option[Double])

/** The flagship metrics query (`cli.py:268-309`,
  * `analyzer.go:91-177`).
  *
  * Computed as ONE job: scan → fused commit filter → partial+final hash
  * aggregation — exactly the single-pass loop the Go analyzer hand-fuses
  * at `analyzer.go:140-174`, but expressed declaratively so Catalyst
  * fuses scan/filter/partial-agg into one whole-stage-codegen stage and
  * the final agg reduces 1 row per partition. At 100 TB this is a full
  * scan + a 1-row-per-partition exchange: no shuffle of data rows at all.
  *
  * Selection-subset metrics use `avg(when(isSelection, …))` /
  * `count(when(…))` conditional aggregates instead of a second filtered
  * pass, matching pandas' two-DataFrame semantics in a single traversal
  * (nulls are ignored by `count`/`avg`, mirroring NaN exclusion).
  */
object AnalyzeQuery {

  /** One-row metrics frame over a commit-filtered event DataFrame. */
  def metricsFrame(commits: DataFrame): DataFrame = {
    val agg = commits.agg(
      count(lit(1)).as("total_commits"),                        // cli.py:304
      count(when(isSelection, 1)).as("total_selections"),       // cli.py:290
      count(when(isDirectCommit, 1)).as("raw_input_commits"),   // cli.py:305
      count(when(isFirstChoice, 1)).as("first_choice_count"),   // cli.py:291
      count(when(isTop3, 1)).as("top3_count"),                  // cli.py:292
      avg(when(isSelection, EventOps.rank)).as("average_rank"), // cli.py:299
      avg(when(isSelection, accuracyScore))
        .as("overall_accuracy_score"))                          // cli.py:294
    // Rates are undefined on empty subsets (the reference early-returns:
    // cli.py:279-288); under ANSI mode that must be an explicit
    // null-on-zero division, not an error.
    def rate(num: Column, den: Column): Column =
      when(den === 0, lit(null)).otherwise(num / den)
    agg
      .withColumn("first_choice_hit_rate",                      // cli.py:297
        rate(col("first_choice_count"), col("total_selections")))
      .withColumn("top3_hit_rate",                              // cli.py:298
        rate(col("top3_count"), col("total_selections")))
      .withColumn("direct_input_rate",                          // cli.py:309
        rate(col("raw_input_commits") * lit(100.0), col("total_commits")))
  }

  /** Collect the single metrics row into the typed result (the only
    * `.collect()` in the engine — of exactly one row, as in
    * `analyzer.go:176`). Returns None on empty input, mirroring the
    * early-return guards (`cli.py:279-281`, `analyzer.go:100-102`). */
  def run(commits: DataFrame): Option[AnalysisResult] = {
    val row = metricsFrame(commits).collect()(0)
    val total = row.getAs[Long]("total_commits")
    if (total == 0L) None
    else {
      def optD(name: String): Option[Double] =
        if (row.isNullAt(row.fieldIndex(name))) None
        else Some(row.getAs[Double](name))
      val selections = row.getAs[Long]("total_selections")
      Some(AnalysisResult(
        totalCommits = total,
        totalSelections = selections,
        rawInputCommits = row.getAs[Long]("raw_input_commits"),
        firstChoiceCount = row.getAs[Long]("first_choice_count"),
        top3Count = row.getAs[Long]("top3_count"),
        firstChoiceHitRate =
          if (selections == 0L) None else optD("first_choice_hit_rate"),
        top3HitRate =
          if (selections == 0L) None else optD("top3_hit_rate"),
        averageRank = optD("average_rank"),
        overallAccuracyScore = optD("overall_accuracy_score"),
        directInputRate = optD("direct_input_rate")))
    }
  }
}
