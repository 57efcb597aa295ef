package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): at most `m`
  * (item, weight) slots; every item with true frequency > N/(m+1) is
  * GUARANTEED present in the final sketch, and each retained weight
  * underestimates the true count by at most N/(m+1).
  *
  * Why this exists next to d13's exact `groupBy(token).count()`: the
  * exact form shuffles the whole token stream on the token key —
  * correct, but the shuffle is corpus-sized. The sketch pass is a
  * no-shuffle aggregation with O(m) state per partial (map-side
  * combine does almost all the work; the final merge touches
  * #partitions × m entries), and the follow-up exact recount in
  * [[graft.pipeline.HeavyHitters]] shuffles ONLY the candidate tokens
  * — the 100 TB path for "top-k tokens over a web corpus".
  *
  * The MERGED sketch's contents depend on partition boundaries (only
  * the error bound is deterministic), so the sketch itself is never a
  * query output — callers recount candidates exactly and emit that
  * (deterministic, oracle-checkable) result instead.
  *
  * - reduce: present → +1; free slot → insert; full → decrement ALL
  *   weights by 1, dropping zeros (the classic m-way cancellation).
  * - merge: add weights, then if over capacity subtract the (m+1)-th
  *   largest weight from every slot and drop non-positives — the
  *   mergeable-summaries rule that preserves the εN bound.
  */
class MisraGries(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m >= 1, "m must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long],
                      x: String): Map[String, Long] =
    if (x == null) buf // SQL aggregates skip nulls
    else buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < m => buf.updated(x, 1L)
      case None =>
        // decrement-all: one occurrence of x cancels one occurrence
        // of each resident item
        buf.flatMap { case (k, c) =>
          if (c > 1) Some(k -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest weight everywhere; ≤ m survive
      val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)
        .apply(m)
      sum.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf
  override def bufferEncoder: Encoder[Map[String, Long]] =
    MisraGries.mapEnc
  override def outputEncoder: Encoder[Map[String, Long]] =
    MisraGries.mapEnc
}

object MisraGries {
  private[functions] val mapEnc: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()

  /** Column form over a string column; nulls are skipped. */
  def agg(m: Int, item: Column): Column =
    org.apache.spark.sql.functions.udaf(new MisraGries(m),
      Encoders.STRING).apply(item)
}
