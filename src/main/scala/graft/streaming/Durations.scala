package graft.streaming

import org.apache.spark.sql.catalyst.util.IntervalUtils
import org.apache.spark.unsafe.types.UTF8String

/** Eager, fail-at-construction parsing of human duration strings
  * ("1 hour", "30 seconds") into milliseconds. Streaming state TTLs
  * are configured with such strings; parsing them lazily inside the
  * per-key step function (where a malformed string would surface as a
  * per-batch exception — or worse, be swallowed and silently disable
  * eviction) is how state stores grow unbounded in production. Every
  * wiring in this package validates its TTL here, at query
  * construction time. */
object Durations {

  /** Parse to milliseconds, rejecting month-denominated and
    * non-positive intervals (months have no fixed millisecond width,
    * and a zero/negative TTL would evict state instantly). */
  def toMillis(duration: String): Long = {
    val iv = IntervalUtils.safeStringToInterval(
      UTF8String.fromString(duration))
    if (iv == null)
      throw new IllegalArgumentException(
        s"cannot parse duration: '$duration'")
    require(iv.months == 0,
      s"duration must be day-or-smaller denominated (months vary): " +
        s"'$duration'")
    val ms = iv.days * 86400000L + iv.microseconds / 1000
    require(ms > 0, s"duration must be positive, got '$duration'")
    ms
  }
}
