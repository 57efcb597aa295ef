package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Shannon entropy of a token array's
  * empirical distribution in integer micro-nats.
  *
  *   token_entropy_micro(tokens array<string>) -> bigint
  *
  * Bit-identical to the declarative fold in
  * [[graft.pipeline.TextStats.tokenEntropyMicro]] — same per-distinct
  * term −round(1e6 · p · ln p) with Spark Round's HALF_UP semantics
  * (BigDecimal.valueOf, i.e. shortest-decimal, away-from-zero at .5 —
  * NOT Math.round, which rounds −2.5 to −2) and the identical
  * left-associated (1e6·p)·ln(p) product — but one O(tokens) hash-count
  * pass instead of the O(distinct·tokens) count-within-array filter,
  * and inside whole-stage codegen via `doGenCode`. The declarative twin
  * stays the oracle-portability reference; TextStatsSpec differential-
  * tests the two equal on randomized corpora.
  *
  * Null elements are skipped entirely (excluded from n and counts) —
  * the whitespace tokenizer never produces them, matching the twin's
  * behavior on its actual input domain. */
case class TokenEntropyMicro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy_micro expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "token_entropy_micro"

  override def nullSafeEval(tokens: Any): Any =
    TokenEntropyMicro.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenEntropyMicro.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenEntropyMicro = copy(child = newChild)
}

object TokenEntropyMicro {

  /** The per-row kernel (called from generated code). */
  def compute(tokens: ArrayData): Long = {
    val num = tokens.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](
      math.max(8, num * 2))
    var i = 0
    var n = 0
    while (i < num) {
      if (!tokens.isNullAt(i)) {
        n += 1
        counts.merge(tokens.getUTF8String(i), Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a + b))
      }
      i += 1
    }
    if (n == 0) return 0L
    val nd = n.toDouble
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().doubleValue() / nd
      // Spark Round(double, 0): BigDecimal.valueOf (shortest decimal)
      // + HALF_UP — away from zero on the negative .5 boundary
      sum += java.math.BigDecimal.valueOf(1e6 * p * java.lang.Math.log(p))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    -sum
  }
}
