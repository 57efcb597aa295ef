package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k-permutation MinHash signature over word
  * shingles, in one pass.
  *
  *   minhash_sig(tokens array<string>, k, shingleSize) -> array<bigint>
  *
  * Semantically identical (bit-for-bit) to the declarative form in
  * [[graft.pipeline.Dedup.minhashSignature]] ∘ shingles — it reproduces
  * `xxhash64(j, shingle)`'s seeding chain (seed 42 → hashInt(j) →
  * hashUnsafeBytes(shingle)) — but runs as a tight JVM loop instead of
  * interpreted higher-order collection lambdas, and participates in
  * whole-stage codegen via `doGenCode` (the generated code calls the
  * static kernel; no interpreted-projection fallback in the scan stage).
  *
  * Shingle rules mirror the declarative version: windows of
  * `shingleSize` consecutive tokens joined by " " (concat_ws semantics:
  * null tokens skipped), `max(numTokens - shingleSize, 0) + 1` windows.
  * Duplicate shingles need no dedup — the min is unaffected.
  */
case class MinHashSig(child: Expression, k: Int, shingleSize: Int)
    extends UnaryExpression {

  require(k > 0 && shingleSize > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(tokens: Any): Any =
    MinHashSig.compute(tokens.asInstanceOf[ArrayData], k, shingleSize)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

object MinHashSig {

  private val SparkHashSeed = 42L

  /** The per-row kernel (called from generated code). */
  def compute(tokens: ArrayData, k: Int, shingleSize: Int)
      : GenericArrayData = {
    val numTok = tokens.numElements()
    // xxhash64(j, s) chains: seed 42 -> hashInt(j) -> bytes; the j part
    // is shingle-independent, precompute it
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = XXH64.hashInt(j, SparkHashSeed); j += 1 }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    val numWindows = math.max(numTok - shingleSize, 0) + 1
    val window = new Array[UTF8String](shingleSize)
    var i = 0
    while (i < numWindows) {
      var w = 0
      while (w < shingleSize) {
        window(w) =
          if (i + w < numTok) tokens.getUTF8String(i + w) else null
        w += 1
      }
      val shingle = UTF8String.concatWs(sep, window: _*)
      j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(shingle.getBaseObject,
          shingle.getBaseOffset, shingle.numBytes(), seeds(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
