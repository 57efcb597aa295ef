package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned-classifier TRAINING — the counterpart to the inference-only
  * hashed linear scorer ([[TextStats.hashedLinearLogitMicro]]):
  * multinomial Naive Bayes with Laplace smoothing, trained and scored
  * entirely in exact aggregates, so the whole train→score→evaluate
  * loop is ANSI-oracle-checkable (no gradient descent — NB's MLE *is*
  * a pair of groupBys, which is why it is the classic first trainable
  * model for a data-pipeline engine).
  *
  * Arithmetic discipline (the d28/d47 convention): every log term is
  * individually rounded to MICRO-integers — round(1e6·ln(·)) — before
  * any summation, so per-document scores are order-independent long
  * sums and bit-comparable across engines; the ≤1-ulp cross-libm ln
  * drift is absorbed by the rounding exactly as in the LM-score
  * entries. Prediction ties break to the lexicographically smallest
  * label via min(struct(−score, label)) — an aggregate, not a window.
  *
  * Shape at scale: training is one (label, token) groupBy over the
  * exploded corpus (map-side combine); class statistics are a
  * BOUNDED parameter fetch (`require` ≤ 64 classes — class lists are
  * report parameters) folded in as literal when-chains; scoring
  * explodes each token onto the class list (a ≤|classes|× map-side
  * multiplier) and LEFT-joins the vocab-sized count table on
  * (label, token) — unseen (label, token) pairs coalesce to the
  * smoothed floor. Nothing data-sized lands on the driver.
  */
object Classify {

  /** Train multinomial NB on (`textCol`, `labelCol`), re-score the
    * SAME corpus, and return the label confusion matrix
    * (label_actual, label_pred, n_docs) — the self-classification
    * audit of how separable the classes are under a bag-of-words
    * model. */
  def nbSelfConfusion(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String): DataFrame =
    nbConfusion(docs, docs, idCol, textCol, labelCol)

  /** Train on `train`, score `score` (the holdout form — compose with
    * a leakage-safe split for a real evaluation). All model
    * statistics, INCLUDING the smoothing vocabulary size, come from
    * `train` only; a holdout token unseen in training contributes the
    * smoothed floor for every class through the left-join coalesce.
    * Predictions range over the TRAIN labels only; a holdout doc
    * whose actual label never occurred in training still appears in
    * the matrix under its own label_actual (necessarily
    * misclassified — the honest accounting). */
  def nbConfusion(train: DataFrame, score: DataFrame, idCol: String,
                  textCol: String, labelCol: String): DataFrame = {
    val toks = train.select(col(idCol).as("_id"),
      col(labelCol).as("_lab"),
      explode(split(col(textCol), " ")).as("_tok"))
    // bounded parameter fetches: per-class token totals + doc counts,
    // corpus vocab size, total docs (the k-centroid convention)
    val classStats = toks.groupBy("_lab")
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(classStats.size >= 2 && classStats.size <= 64,
      s"nbConfusion expects 2..64 classes, got ${classStats.size}")
    val docCounts = train.groupBy(col(labelCol).as("_lab"))
      .agg(count(lit(1)).as("_d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = docCounts.values.sum
    val vocabSize = toks.select("_tok").distinct().count()
    val labels = classStats.keys.toSeq.sorted

    // HALF_UP (away from zero), matching Spark's round() and DuckDB's
    // round() on these NEGATIVE log values — Math.round floors and
    // would disagree on an exact .5 micro boundary
    def priorMicro(l: String): Long =
      BigDecimal(1e6 * math.log(
        docCounts(l).toDouble / totalDocs.toDouble))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // literal when-chain over the bounded class list
    def denomOf(cand: org.apache.spark.sql.Column) =
      labels.tail.foldLeft(
        when(cand === labels.head,
          lit((classStats(labels.head) + vocabSize).toDouble))) {
        (acc, l) => acc.when(cand === l,
          lit((classStats(l) + vocabSize).toDouble))
      }
    def priorOf(cand: org.apache.spark.sql.Column) =
      labels.tail.foldLeft(
        when(cand === labels.head, lit(priorMicro(labels.head)))) {
        (acc, l) => acc.when(cand === l, lit(priorMicro(l)))
      }

    val counts = toks.groupBy(col("_lab").as("_clab"),
      col("_tok").as("_ctok")).agg(count(lit(1)).as("_c"))
    val scoreToks = score.select(col(idCol).as("_id"),
      col(labelCol).as("_lab"),
      explode(split(col(textCol), " ")).as("_tok"))
    val scored = scoreToks
      .select(col("_id"), col("_lab"), col("_tok"),
        explode(array(labels.map(lit(_)): _*)).as("_cand"))
      .join(counts, col("_cand") === col("_clab") &&
        col("_tok") === col("_ctok"), "left")
      .select(col("_id"), col("_lab"), col("_cand"),
        round(lit(1e6) * log(
          (coalesce(col("_c"), lit(0L)) + lit(1L)).cast("double") /
            denomOf(col("_cand")))).cast("long").as("_term"))
      .groupBy("_id", "_lab", "_cand")
      .agg((sum(col("_term")) + priorOf(col("_cand"))).as("_score"))
    scored
      .groupBy(col("_id"), col("_lab"))
      .agg(min(struct((-col("_score")).as("_neg"),
        col("_cand").as("_pl"))).as("_best"))
      .groupBy(col("_lab").as("label_actual"),
        col("_best._pl").as("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
