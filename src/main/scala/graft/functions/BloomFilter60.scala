package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Portable Bloom filter over 60-bit md5 hashes — the MEMBERSHIP
  * member of the sketch family (KMV = distinct count, Count-Min /
  * Misra-Gries = frequency, MinHash = set similarity, KLL = ranks):
  * m bits in m/64 longs, k probe positions per key by Kirsch-
  * Mitzenmacher double hashing over the ONE portable hash
  * (pos_i = (h1 + i·h2) mod m with h1 = h mod 2³⁰ and
  * h2 = (h div 2³⁰) | 1 — odd, so the stride cycles all of m when m
  * is a power of two). The 100 TB use is the semi-join pre-filter: a
  * small dimension's key set travels as m/64 longs and the fact scan
  * drops non-members map-side, no shuffle, before any join.
  *
  * Unlike KLL/Misra-Gries, the finished state is a PURE FUNCTION of
  * the input SET: bit-OR insert is associative, commutative, and
  * idempotent, so partition boundaries, merge order, and at-least-
  * once replays all produce the identical bit array — the KMV
  * verification story (a SQL oracle replays every membership decision
  * exactly, no bit array needed: a probe hits iff all k of its
  * positions appear among the positions any build key set). No false
  * negatives ever; false-positive rate ≈ (1 − e^(−kn/m))^k, audited
  * in-entry against the exact semi-join.
  */
class BloomFilter60(mBits: Int, k: Int)
    extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    "mBits must be a power of two >= 64 (the double-hash stride " +
      "argument needs it)")
  require(k >= 1 && k <= 16, "k in [1, 16]")

  override def zero: Seq[Long] = Vector.fill(mBits / 64)(0L)

  override def reduce(buf: Seq[Long], h: java.lang.Long): Seq[Long] =
    if (h == null) buf // SQL aggregates skip nulls
    else {
      // Aggregator.reduce may mutate its buffer in place (the
      // documented contract). The previous form set each probe bit
      // through immutable Seq.updated — O(k·m/64) word copies per
      // input row once the encoder round-trip made the buffer
      // array-backed, the wrong shape for a 100 TB build side. Here
      // the first reduce per buffer pays ONE array copy (zero is a
      // Vector); every later call mutates the wrapped array, O(k).
      // OWNERSHIP (r13 ADVICE): reduce therefore takes ownership of
      // an ArraySeq.ofLong input — legal inside Spark's aggregation
      // (buffers originate from zero/reduce/the encoder and are never
      // shared), but do NOT pass a RETAINED filter (e.g. a fetched
      // d72/d73 artifact) through reduce directly: its "immutable"
      // Seq would be mutated in place. Fold retained filters with
      // merge(), which allocates fresh words.
      val a = buf match {
        case w: scala.collection.immutable.ArraySeq.ofLong =>
          w.unsafeArray
        case other => other.toArray
      }
      BloomFilter60.positions(h.longValue, mBits, k).foreach { pos =>
        a((pos >> 6).toInt) |= (1L << (pos & 63L))
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    a.zip(b).map { case (x, y) => x | y }

  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] = KMinValues.seqLongEnc
  override def outputEncoder: Encoder[Seq[Long]] = KMinValues.seqLongEnc
}

object BloomFilter60 {

  /** The k probe positions of one 60-bit hash (driver-side twin of
    * [[mightContain]]'s column arithmetic and of the SQL oracle's
    * replay — one formula, three renderings). */
  def positions(h: Long, mBits: Int, k: Int): Seq[Long] = {
    val h1 = h % (1L << 30)
    val h2 = (h >> 30) | 1L // h ≥ 0: shift = div, exactly
    (0 until k).map(i => (h1 + i.toLong * h2) % mBits)
  }

  /** Column form over an already-hashed long column (callers hash
    * with the portable [[graft.pipeline.Dedup.md5Long60]]). Nulls are
    * skipped. */
  def agg(mBits: Int, k: Int, hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new BloomFilter60(mBits, k),
      Encoders.LONG).apply(hash)

  /** Membership probe as a pure column expression over a FETCHED
    * filter (m/64 longs — a bounded parameter folded in as a literal,
    * the constant-key-join rule): k bit tests ANDed, all built-in
    * functions, codegen-friendly, map-side — the shape that rides a
    * 100 TB fact scan. `hash` must be the same portable 60-bit hash
    * the filter was built from. */
  def mightContain(bits: Seq[Long], mBits: Int, k: Int,
                   hash: Column): Column = {
    val h1 = pmod(hash, lit(1L << 30))
    val h2 = shiftright(hash, 30).bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
      val word = shiftright(pos, 6) + lit(1L) // element_at is 1-based
      val bit = pos.bitwiseAND(lit(63L))
      call_function("shiftright",
          element_at(typedlit(bits), word.cast("int")),
          bit.cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
