package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate: bounded top-k rows per group under an `Ordering`.
  *
  * The scale-correct alternative to `rank().over(Window.partitionBy(g))`
  * + `filter(rank <= k)` when the partition key has low cardinality: the
  * window form sorts every partition in full on a handful of tasks,
  * while this aggregator keeps at most k rows per map task (partial
  * aggregation), ships only k-row buffers through the exchange, and
  * merges them on the final side — O(k) state, no full sort, no skew
  * on the group key. Differential-tested equal to the window form in
  * ScaleOpsSpec (the window ordering must be total for equivalence —
  * rank == dense_rank == row_number then).
  *
  * The buffer is an ascending-sorted Seq bounded at k; inserts are an
  * O(k) scan (k is small by construction — a top-k with large k should
  * be a window/sort instead).
  */
class TopK[A](k: Int, ord: Ordering[A], enc: Encoder[A],
              seqEnc: Encoder[Seq[A]])
    extends Aggregator[A, Seq[A], Seq[A]] {

  override def zero: Seq[A] = Seq.empty

  private def insert(buf: Seq[A], a: A): Seq[A] =
    if (buf.length >= k && ord.gteq(a, buf.last)) buf
    else {
      val i = buf.indexWhere(ord.gt(_, a))
      val at = if (i < 0) buf.length else i
      val grown = (buf.take(at) :+ a) ++ buf.drop(at)
      if (grown.length > k) grown.take(k) else grown
    }

  override def reduce(buf: Seq[A], a: A): Seq[A] = insert(buf, a)

  override def merge(a: Seq[A], b: Seq[A]): Seq[A] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[A]): Seq[A] = buf

  override def bufferEncoder: Encoder[Seq[A]] = seqEnc
  override def outputEncoder: Encoder[Seq[A]] = seqEnc
}

object TopK {
  /** Column form: one argument column per field of `A` (a tuple input
    * type takes its fields as separate arguments, positionally). The
    * ordering is the "best-first" priority: `ord.lt(a, b)` means `a`
    * ranks above `b`, so the finished buffer is rank order 1..k. */
  def agg[A](k: Int, input: Column*)(implicit ord: Ordering[A],
                                     enc: Encoder[A],
                                     seqEnc: Encoder[Seq[A]]): Column =
    org.apache.spark.sql.functions.udaf(
      new TopK[A](k, ord, enc, seqEnc), enc).apply(input: _*)
}
