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
}
