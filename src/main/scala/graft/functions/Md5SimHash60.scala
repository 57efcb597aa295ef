package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: PORTABLE 60-bit SimHash (md5-based)
  * over a token array, in one pass.
  *
  *   md5_simhash60(tokens array<string>) -> bigint
  *
  * Bit-for-bit identical to the declarative
  * [[graft.pipeline.Dedup.simhash60Portable]] (differential-tested):
  * per token the top 60 bits of md5 (= the leading 15 hex chars as an
  * integer, read directly off the first 8 digest bytes), a +1/−1 vote
  * per bit, and a set bit wherever the vote sum is positive. The
  * declarative form runs a 60-lambda interpreted zip_with per token
  * (~60·|tokens| closure evaluations per row — the measured bulk of
  * d54's fingerprint lineage); this kernel is one JVM loop with a
  * reused digest instance, inlined into whole-stage codegen via
  * `doGenCode`. The cross-engine contract (the DuckDB oracle
  * recomputes the same values from the md5 hex) is unchanged.
  */
case class Md5SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash60 expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"

  override def nullSafeEval(tokens: Any): Any =
    Md5SimHash60.compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5SimHash60 = copy(child = newChild)
}

object Md5SimHash60 {

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel (called from generated code). A NULL token
    * element votes −1 on every bit, exactly like the declarative
    * form: there md5Long60(null) is null, each bit's
    * `when(null === 1, +1).otherwise(−1)` falls through to the
    * otherwise branch, and all 60 votes shift down by one. Token
    * arrays from split() are never null-elemented, but hand-built
    * arrays must hash identically for the differential spec's
    * bit-for-bit claim to hold. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](60)
    val digest = digestTL.get()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      } else {
        digest.reset()
        val d = digest.digest(t.getBytes)
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
        val h = be >>> 4 // top 60 bits, big-endian
        b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}
