package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch: keep the k SMALLEST
  * distinct hash values seen; the k-th smallest estimates the distinct
  * count as `(k-1) · 2^60 / h_(k)` over the [0, 2^60) portable-hash
  * space (fewer than k distinct hashes ⇒ the sketch IS the exact
  * count).
  *
  * The properties that matter at 100 TB: O(k) state per group,
  * map-side partial aggregation, ORDER-INDEPENDENT merge (a set union
  * truncated at k) — the same mergeability story as HLL. Unlike HLL,
  * the sketch is a pure function of the input SET under a portable
  * hash, so a SQL oracle recomputes it exactly (q25) — the
  * approximate-distinct path gets hash-exact verification instead of
  * q8's rows-only check.
  *
  * Inserts are an O(k) scan with set semantics (duplicate hashes — the
  * same value seen again — must not occupy a second slot, or the
  * estimator biases low). k is small by construction.
  */
class KMinValues(k: Int)
    extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(k >= 2, "k must be >= 2")

  override def zero: Seq[Long] = Seq.empty

  private def insert(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length >= k && h >= buf.last) buf
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf // already present: set semantics
      else {
        val at = if (i < 0) buf.length else i
        val grown = (buf.take(at) :+ h) ++ buf.drop(at)
        if (grown.length > k) grown.take(k) else grown
      }
    }

  // boxed input so a null hash (e.g. md5Long60 of a null text) is
  // SKIPPED like every SQL aggregate skips nulls — a primitive encoder
  // would either kill the task or smuggle a phantom 0L into slot 1
  override def reduce(buf: Seq[Long], h: java.lang.Long): Seq[Long] =
    if (h == null) buf else insert(buf, h.longValue)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = KMinValues.seqLongEnc
  override def outputEncoder: Encoder[Seq[Long]] = KMinValues.seqLongEnc
}

object KMinValues {
  private[functions] val seqLongEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form over an already-hashed long column (callers hash with
    * the portable [[graft.pipeline.Dedup.md5Long60]] so the sketch is
    * cross-engine reproducible). Null hashes are ignored. */
  def agg(k: Int, hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new KMinValues(k),
      org.apache.spark.sql.Encoders.LONG).apply(hash)

  /** The KMV estimate as a column over a finished sketch: exact size
    * below k, else `(k-1) · 2^60 / h_(k)`. 2^60 and (k-1)·2^60 are
    * exactly representable doubles, and both engines promote the k-th
    * hash to double by the same IEEE rounding, so the estimate is
    * bit-identical cross-engine. */
  def estimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) /
        element_at(sketch, k).cast("double"))
  }

  /** Order-independent union of two finished sketches truncated at k —
    * the streaming/index-merge primitive. Associative AND commutative
    * (a set union truncated at k), so any batch fold of a partitioned
    * stream equals the one-shot sketch over the union — the q66
    * replay entry pins exactly that. */
  def mergeSketches(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    new KMinValues(k).merge(a, b)

  /** Driver-side twin of [[estimate]] over a FETCHED sketch (k longs —
    * a bounded parameter, never data): the same IEEE ops in the same
    * order, so streaming monitors that hold sketch state driver-side
    * report the identical estimate. */
  def estimateOf(sketch: Seq[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble * math.pow(2, 60) / sketch(k - 1).toDouble
}
