package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    val scored = nbScores(train, score, idCol, textCol, labelCol)
    scored
      .groupBy(col("_id"), col("_lab"))
      .agg(min(struct((-col("_score")).as("_neg"),
        col("_cand").as("_pl"))).as("_best"))
      .groupBy(col("_lab").as("label_actual"),
        col("_best._pl").as("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** The raw per-(doc, candidate-class) integer-micro NB scores the
    * confusion matrices argmax over — exposed so downstream model-
    * quality reports (ROC-AUC on a class margin, calibration over the
    * softmax) compose with the SAME trained model instead of
    * re-deriving one. Returns (_id, _lab, _cand, _score). */
  def nbScores(train: DataFrame, score: DataFrame, idCol: String,
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
  }

  /** Model-quality capstone over the trained NB: score a holdout,
    * frame class `posLabel` as the binary task, and report ranking
    * quality (tie-aware ROC-AUC over the integer margin
    * s_pos − max s_other) NEXT TO calibration (ECE over the softmax
    * probability of posLabel) from the SAME scored frame — the
    * train → score → rank-audit → calibration-audit loop as one
    * composition.
    *
    * The softmax keeps the exact-integer discipline: each class term
    * round(1e6·exp((s_c − s_max)/1e6)) quantizes to a micro integer
    * BEFORE the per-doc sum (order-free long addition — never a float
    * accumulation whose order an engine could pick differently), and
    * p is ONE division of two exact integers (the welch convention).
    * The framed holdout is localCheckpointed: two audit consumers
    * must not run the scoring explode+join twice. The two 1-row
    * audits meet on an ATTRIBUTE-DEPENDENT equi-key
    * (n_pos + n_neg = n — both count the same frame), because a
    * constant-key join would fold to `true` and plan the banned
    * BroadcastNestedLoopJoin. Returns one row
    * (auc, n_pos, n_neg, ece_micro, n, n_bins_used). */
  def nbModelReport(train: DataFrame, score: DataFrame, idCol: String,
                    textCol: String, labelCol: String,
                    posLabel: String): DataFrame = {
    // a typo'd posLabel would NULL every margin and read as a
    // plausible "model is random" report (auc 0.5, ece NULL) — fail
    // loudly instead; the label list is a bounded parameter fetch
    // (<= 64 classes by the nbScores contract) (round-11 review)
    val trainLabels = train.select(col(labelCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    require(trainLabels.contains(posLabel),
      s"posLabel '$posLabel' is not a training label " +
        s"(${trainLabels.toSeq.sorted.mkString(", ")})")
    val scores = nbScores(train, score, idCol, textCol, labelCol)
    val wDoc = Window.partitionBy("_id")
    val framed = scores
      .withColumn("_smax", max(col("_score")).over(wDoc))
      .withColumn("_t", round(lit(1e6) * exp(
          (col("_score") - col("_smax")).cast("double") / lit(1e6)))
        .cast("long"))
      .groupBy("_id", "_lab")
      .agg(
        max(when(col("_cand") === posLabel, col("_t"))).as("t_pos"),
        max(when(col("_cand") === posLabel, col("_score")))
          .as("s_pos"),
        max(when(col("_cand") =!= posLabel, col("_score")))
          .as("s_alt"),
        sum(col("_t")).as("t_sum"))
      .select((col("s_pos") - col("s_alt")).as("margin"),
        (col("t_pos").cast("double") / col("t_sum").cast("double"))
          .as("p"),
        when(col("_lab") === posLabel, 1L).otherwise(0L).as("y"))
      .localCheckpoint()
    Eval.rocAuc(framed, col("margin"), col("y"))
      .join(Eval.calibrationErrorMicro(framed, col("p"), col("y")),
        col("n_pos") + col("n_neg") === col("n"))
  }
}
