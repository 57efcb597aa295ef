package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object ExprUtils {

  /** Let-binding for column expressions: evaluate `value` ONCE and
    * reference it many times in `body`.
    *
    * Catalyst inlines projected columns into downstream expressions
    * (CollapseProject) and evaluates a lambda's free subexpressions per
    * element, so an expensive array expression referenced k times — e.g.
    * a MinHash signature sliced by k bands — is recomputed k times.
    * Wrapping it as the element of a 1-element array and referencing the
    * lambda VARIABLE instead makes the engine evaluate it exactly once:
    * `element_at(transform(array(value), v -> body(v)), 1)`. Measured
    * order-of-magnitude wins on the dedup pipeline at sf0.1. */
  def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Spread a narrow input across the cluster BEFORE CPU-heavy
    * map-side work (n-gram building, tokenization, shingling) when
    * the scan gives too little parallelism — the guide-§2.5 "one
    * unsplittable file" fix, made scale-adaptive: a single-row-group
    * parquet file scans as ONE task, so everything up to the first
    * exchange runs single-threaded no matter how many cores exist.
    * Round-robin repartition to defaultParallelism ships only the
    * skinny input rows once; at production scale the scan already
    * has ≥ defaultParallelism/4 partitions and this is a no-op (no
    * extra exchange). Results are unaffected: every downstream
    * consumer in this repo is keyed or order-free (the d28 exactness
    * discipline is what makes this rebalance safe to apply). */
  def spread(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // streaming frames have no .rdd and micro-batches are already
    // cluster-spread by the source — pass through untouched
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 4 <= target) df.repartition(target)
    else df
  }
}
