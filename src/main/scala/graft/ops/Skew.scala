package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation (VERDICT r1 / SURVEY §7.4: at 100 TB the
  * miss-frequency key — committed text — is Zipf-skewed; a plain
  * `groupBy(key)` funnels hyper-frequent keys into single tasks).
  *
  * Two-level salted counting: append a deterministic salt derived from
  * a secondary column, aggregate (key, salt) — spreading one hot key
  * over `buckets` tasks — then aggregate the per-salt partials by key.
  * Spark's map-side partial aggregation already bounds the *shuffle*
  * volume per task; salting additionally bounds the *reduce-side* work
  * per task, which partial aggregation alone does not.
  *
  * For non-decomposable aggregates at scale, AQE's
  * `skewJoin`/`OptimizeSkewedJoin` handle the join case; this helper is
  * for hand-planned aggregations.
  */
object Skew {

  /** Salted count: equivalent to `df.groupBy(key).count()` for any data
    * (proved in the spec), but each hot key spreads over `buckets`
    * reduce tasks. `saltFrom` should be a roughly-uniform column (an id,
    * a hash input); it only influences load balance, never the result. */
  def saltedCount(df: DataFrame, key: Column, saltFrom: Column,
                  buckets: Int, out: String = "count"): DataFrame = {
    val partial = df
      .groupBy(key.as("_k"), pmod(xxhash64(saltFrom), lit(buckets)).as("_s"))
      .agg(count(lit(1)).as("_c"))
    partial.groupBy(col("_k")).agg(sum(col("_c")).as(out))
      .withColumnRenamed("_k", "key")
  }
}
