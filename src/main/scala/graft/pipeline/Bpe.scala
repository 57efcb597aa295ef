package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) MERGE TRAINING — the subword-tokenizer
  * trainer the LLM-pipeline family was missing: d31 tokenizes against
  * a GIVEN vocabulary; this learns the merge table itself
  * (Sennrich et al. 2016's iterative top-1 pair merge).
  *
  * Algorithm, exactly the textbook loop: collapse the corpus to a
  * word-frequency vocabulary, split each word into character symbols,
  * then `rounds` times (1) count adjacent symbol pairs weighted by
  * word frequency, (2) take the most frequent pair (deterministic
  * tie-break: count desc, then lexicographic), (3) merge every
  * non-overlapping leftmost occurrence of that pair in every word.
  *
  * Cross-engine-exact representation: each word is one STRING with
  * every symbol wrapped in parens — "low" → "(l)(o)(w)" — so step (3)
  * is a plain (non-regex) `replace(enc, "(a)(b)", "(ab)")`. Both
  * Spark's `replace` and an ANSI engine's scan LEFTMOST
  * NON-OVERLAPPING, which IS the BPE greedy merge: "(l)(l)(l)(l)"
  * under merge (l,l) becomes "(ll)(ll)", and "(l)(l)(l)" becomes
  * "(ll)(l)". The wrapping makes a symbol boundary unambiguous — a
  * pattern can never match across symbols — PROVIDED symbols never
  * contain parens, which the `alphabet` filter guarantees (words are
  * pre-filtered to it; the standard practice of training BPE on a
  * cleaned token stream).
  *
  * Shape at scale: everything after the first groupBy is
  * VOCABULARY-sized, never corpus-sized — the corpus collapses to
  * (word, n) with map-side combine, exactly how reference BPE
  * trainers operate on word-count tables. Each round is one
  * vocab-sized scan (pair explode + sum shuffle on pair keys) plus a
  * 1-row bounded argmax fetch (TakeOrdered, not a global sort), and
  * the merge itself is a map-only column rewrite. The vocab frame is
  * localCheckpointed per round so k rounds do not stack k lineages
  * (the d44 chained-replay discipline). A heavy-hitter sketch
  * (MisraGries) could replace the exact pair count at extreme vocab
  * sizes; at any realistic vocabulary (millions of words) the exact
  * aggregate is already tiny next to the corpus scan that built it.
  */
object Bpe {

  /** Train `rounds` BPE merges over the words of `textCol`. Returns
    * one row per executed round: (round, lhs, rhs, merged,
    * pair_count); stops early if no adjacent pair remains. */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
                  alphabet: String = "[a-z0-9]+"): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      "rounds in [1, 64] (each round is a vocab pass)")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^" + alphabet + "$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    var vocab = words.select(
        concat_ws("", transform(split(col("w"), ""),
          c => concat(lit("("), c, lit(")")))).as("enc"),
        col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.Buffer[
      (Long, String, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val syms = split(
        regexp_replace(col("enc"), "^\\(|\\)$", ""), "\\)\\(")
      val pairCounts = vocab.select(col("n"), explode(
          ExprUtils.let(syms) { s =>
            zip_with(slice(s, lit(1), size(s) - 1),
              slice(s, lit(2), size(s) - 1),
              (a, b) => struct(a.as("l"), b.as("r")))
          }).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
      // bounded 1-row argmax fetch (TakeOrdered); ties break
      // lexicographically so the merge sequence is deterministic
      val top: Array[Row] = pairCounts
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, c) =
          (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
        merges += ((r.toLong, l, rr, l + rr, c))
        vocab = vocab.select(
            replace(col("enc"), lit(s"($l)($rr)"),
              lit(s"(${l + rr})")).as("enc"),
            col("n"))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** The per-round vocabulary state after applying `merges` (for
    * spec-side inspection): words as their current encoded symbol
    * strings with frequencies. */
  private[graft] def encodeVocab(docs: DataFrame, textCol: String,
                                 alphabet: String = "[a-z0-9]+")
      : DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^" + alphabet + "$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat_ws("", transform(split(col("w"), ""),
        c => concat(lit("("), c, lit(")")))).as("enc"), col("n"))
}
