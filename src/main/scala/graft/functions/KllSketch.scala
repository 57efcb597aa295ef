package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** KLL compactor state: `levels(l)` holds items of weight 2^l;
  * `flips(l)` counts compactions at level l (its parity picks which
  * half survives the next compaction — the deterministic stand-in for
  * the paper's coin). */
case class KllState(levels: Seq[Seq[Long]], flips: Seq[Long])

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — the
  * MERGEABLE rank/quantile member of the sketch family, next to KMV
  * (distinct count), Count-Min / Misra-Gries (frequency) and MinHash
  * (sets): O(k) retained items per group regardless of n, map-side
  * partial aggregation, and a merge that preserves the rank-error
  * guarantee under ANY merge tree — the property that lets a 100 TB
  * stream keep ONE bounded state per monitored column instead of
  * re-running an exact narrowing selection per batch (q56's monitor
  * stays as the exact, oracle-checked twin — the d6/d10 pairing).
  *
  * Shape: a stack of compactors; level l holds items of weight 2^l in
  * capacity ≈ k·(2/3)^(top−l) (never below 2). An overfull level
  * sorts, keeps every OTHER item, and promotes the survivors one
  * level up (their weight doubles); the kept parity alternates with
  * the level's compaction count — the deterministic replacement for
  * the paper's random coin (no rand() anywhere in this engine), the
  * same trade Apache DataSketches documents for its deterministic
  * mode: reproducible given identical reduce/merge order, guarantee
  * now empirical rather than w.p. 1−δ (KllSketchSpec pins rank error
  * across orders, merge shapes, and distributions).
  *
  * Like [[MisraGries]], the retained ITEMS depend on partition
  * boundaries — only the error envelope is deterministic — so sketch
  * outputs are driver-audited against exact ranks in their entries
  * (rows-only check) and the hash-threshold sample (q105) carries the
  * oracle-exact verification for the same question.
  *
  * Rank error: |rank(q̂) − ⌈q·n⌉| = O(n/k) up to log factors; the
  * entries report the audited error next to an 8n/k acceptance bound.
  * Values are longs — quantize first (cents/micro), the d28 contract.
  */
class KllSketch(k: Int)
    extends Aggregator[java.lang.Long, KllState, KllState] {
  require(k >= 8 && k <= 4096, "k must be in [8, 4096]")

  override def zero: KllState = KllState(Seq(Vector.empty), Seq(0L))

  // boxed input: null values are SKIPPED like every SQL aggregate
  // (the KMinValues convention)
  override def reduce(buf: KllState, v: java.lang.Long): KllState =
    if (v == null) buf
    else {
      val l0 = buf.levels.head :+ v.longValue
      val levels = l0 +: buf.levels.tail
      if (l0.size > KllSketch.cap(k, 0, levels.length))
        KllSketch.compact(k, levels, buf.flips)
      else KllState(levels, buf.flips)
    }

  override def merge(a: KllState, b: KllState): KllState =
    KllSketch.mergeCompact(k, a, b)

  override def finish(buf: KllState): KllState = buf
  override def bufferEncoder: Encoder[KllState] = KllSketch.enc
  override def outputEncoder: Encoder[KllState] = KllSketch.enc
}

/** Boxed (value, weight) input row for [[KllSketchWeighted]] —
  * either side NULL (or a non-positive weight) skips the row, the
  * SQL-aggregate convention. */
case class KllWeightedIn(v: java.lang.Long, w: java.lang.Long)

/** TOKEN-WEIGHTED KLL ([[KllSketch]] with per-item integer weights):
  * the curation family selects by document but trains by TOKEN, so
  * the length-distribution drift watch wants each document's value
  * weighted by its token count. The compactor's native currency is
  * already weights of 2^l — level l holds items of weight 2^l — so a
  * weighted insert is just the BINARY DECOMPOSITION of w: the item
  * lands once at every set-bit level, total weight is conserved
  * EXACTLY (Σ 2^l over set bits = w; compaction conserves as always),
  * and the same capacity/compaction machinery applies unchanged —
  * the standard weighted-update move (Apache DataSketches' KLL takes
  * it for its weighted update too). An unweighted insert is the
  * special case w = 1. Same deterministic-parity compaction, same
  * merge, same rows-only adjudication: retained items are partition-
  * dependent; the error envelope (now in WEIGHT space: rank error
  * O(W/k) for total weight W) is what the entries audit. */
class KllSketchWeighted(k: Int)
    extends Aggregator[KllWeightedIn, KllState, KllState] {
  require(k >= 8 && k <= 4096, "k must be in [8, 4096]")

  override def zero: KllState = KllState(Seq(Vector.empty), Seq(0L))

  override def reduce(buf: KllState, in: KllWeightedIn): KllState =
    if (in == null || in.v == null || in.w == null || in.w <= 0L) buf
    else KllSketch.insertWeighted(k, buf, in.v.longValue,
      in.w.longValue)

  override def merge(a: KllState, b: KllState): KllState =
    KllSketch.mergeCompact(k, a, b)

  override def finish(buf: KllState): KllState = buf
  override def bufferEncoder: Encoder[KllState] = KllSketch.enc
  override def outputEncoder: Encoder[KllState] = KllSketch.enc
}

object KllSketch {
  private[functions] val enc: Encoder[KllState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()

  // capacity decays geometrically below the top level; two slots
  // minimum keep every level compactable. Shared by the unweighted
  // and weighted aggregators — ONE compactor, two insert paths.
  private[functions] def cap(k: Int, level: Int, h: Int): Int =
    math.max(2, math.ceil(
      k * math.pow(2.0 / 3.0, (h - 1 - level).toDouble)).toInt)

  private[functions] def compact(k: Int, levels0: Seq[Seq[Long]],
                                 flips0: Seq[Long]): KllState = {
    var levels = levels0.map(_.toVector).toVector
    var flips = flips0.toVector
    var changed = true
    while (changed) {
      changed = false
      var l = 0
      while (l < levels.length) {
        if (levels(l).size > cap(k, l, levels.length)) {
          val sorted = levels(l).sorted
          // only an EVEN count compacts exactly (m items of weight w
          // become m/2 of weight 2w); an odd level leaves its
          // smallest item in place so Σ 2^l·|level l| stays the true
          // insert count — KllSketchSpec pins the conservation
          val (leftover, body) =
            if (sorted.size % 2 == 1) (Vector(sorted.head), sorted.tail)
            else (Vector.empty[Long], sorted)
          val parity = (flips(l) % 2).toInt
          val promoted = body.indices.collect {
            case i if i % 2 == parity => body(i)
          }.toVector
          flips = flips.updated(l, flips(l) + 1)
          levels = levels.updated(l, leftover)
          if (l + 1 == levels.length) {
            levels = levels :+ Vector.empty[Long]
            flips = flips :+ 0L
          }
          levels = levels.updated(l + 1, levels(l + 1) ++ promoted)
          changed = true
        }
        l += 1
      }
    }
    KllState(levels, flips)
  }

  // the shared merge body: pad to a common height, concatenate
  // level-wise, sum flips, compact once
  private[functions] def mergeCompact(k: Int, a: KllState,
                                      b: KllState): KllState = {
    val h = math.max(a.levels.length, b.levels.length)
    def pad(s: Seq[Seq[Long]]): Seq[Seq[Long]] =
      s ++ Seq.fill(h - s.length)(Vector.empty[Long])
    def padF(s: Seq[Long]): Seq[Long] = s ++ Seq.fill(h - s.length)(0L)
    val levels = pad(a.levels).zip(pad(b.levels))
      .map { case (x, y) => x ++ y }
    val flips = padF(a.flips).zip(padF(b.flips))
      .map { case (x, y) => x + y }
    compact(k, levels, flips)
  }

  /** Weighted insert by binary decomposition: item `v` of weight `w`
    * lands once at every set-bit level of w (level l's items carry
    * weight 2^l), then one compaction pass if any level overflowed.
    * Weight is conserved EXACTLY: Σ 2^l over w's set bits = w, and
    * compaction conserves — so [[totalWeight]] equals Σ w over all
    * inserts, the invariant KllSketchSpec pins. O(log w) appends per
    * insert; w must be positive (the aggregators skip w <= 0). */
  private[functions] def insertWeighted(k: Int, buf: KllState,
                                        v: Long, w: Long): KllState = {
    var levels = buf.levels.map(_.toVector).toVector
    var flips = buf.flips.toVector
    var l = 0
    var rem = w
    while (rem != 0L) {
      if (levels.length <= l) {
        levels = levels :+ Vector.empty[Long]
        flips = flips :+ 0L
      }
      if ((rem & 1L) == 1L) levels = levels.updated(l, levels(l) :+ v)
      rem >>>= 1
      l += 1
    }
    if (levels.indices.exists(i =>
        levels(i).size > cap(k, i, levels.length)))
      compact(k, levels, flips)
    else KllState(levels, flips)
  }

  /** Column form over a long column (quantize doubles to cents/micro
    * first — the d28 contract). Nulls are skipped. */
  def agg(k: Int, value: Column): Column =
    org.apache.spark.sql.functions.udaf(new KllSketch(k),
      Encoders.LONG).apply(value)

  /** Weighted column form: each row's `value` carries integer weight
    * `weight` (a NULL on either side, or a non-positive weight,
    * skips the row). The quantile/rank machinery downstream is
    * unchanged — [[totalWeight]] is now Σ w and [[quantileOf]]
    * selects by cumulative WEIGHT. */
  def aggWeighted(k: Int, value: Column, weight: Column): Column =
    org.apache.spark.sql.functions.udaf(new KllSketchWeighted(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[KllWeightedIn]())
      .apply(value, weight)

  /** Decode a finished sketch from its struct row (the bounded
    * parameter fetch — O(k) longs, never data). */
  def fromRow(r: Row): KllState = KllState(
    r.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq),
    r.getSeq[Long](1).toSeq)

  /** Total represented weight Σ 2^l·|level l| — equals the number of
    * non-null inserts exactly (compaction halves count but doubles
    * weight; nothing leaks). */
  def totalWeight(s: KllState): Long =
    s.levels.zipWithIndex.map { case (lv, l) => lv.size.toLong << l }.sum

  /** Retained items — the O(k) state bound (≈ 3k: Σ k·(2/3)^i). */
  def numRetained(s: KllState): Int = s.levels.map(_.size).sum

  /** Weighted order statistic at q permille: the smallest retained
    * item whose cumulative weight reaches ⌈q·W/1000⌉ (the q47
    * selection convention, clamped to [1, W]). None on empty. */
  def quantileOf(s: KllState, qPermille: Long): Option[Long] = {
    val w = totalWeight(s)
    if (w == 0L) None
    else {
      val target = math.min(w,
        math.max(1L, (qPermille * w + 999L) / 1000L))
      val items = s.levels.zipWithIndex
        .flatMap { case (lv, l) => lv.map(v => (v, 1L << l)) }
        .sortBy(_._1)
      var cum = 0L
      var i = 0
      while (i < items.length && cum + items(i)._2 < target) {
        cum += items(i)._2
        i += 1
      }
      Some(items(math.min(i, items.length - 1))._1)
    }
  }

  /** Driver-side merge of two fetched sketches — the stream/index
    * primitive (the KMinValues.mergeSketches convention). Preserves
    * the error envelope under any merge tree. */
  def mergeStates(a: KllState, b: KllState, k: Int): KllState =
    new KllSketch(k).merge(a, b)
}
