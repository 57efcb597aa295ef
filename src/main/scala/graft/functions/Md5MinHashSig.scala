package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: PORTABLE MinHash signature (md5-based)
  * over word shingles, in one pass.
  *
  *   md5_minhash_sig(tokens array<string>, k, shingleSize) -> array<bigint>
  *
  * Bit-for-bit identical to the declarative
  * [[graft.pipeline.Dedup.minhashSignaturePortable]] ∘ shingles chain
  * (differential-tested): per shingle take the top 60 bits of md5
  * (= `conv(substring(md5(s),1,15),16,10)`, here read directly off the
  * first 8 digest bytes), reduce mod 2^31−1, then k affine rehashes
  * (2j+1)·h + j² mod 2^31−1 — but one JVM loop with a reused digest
  * instance instead of interpreted collection lambdas + hex-string
  * round trips. The cross-engine contract (DuckDB oracle recomputes
  * the same values from the md5 hex) is unchanged.
  *
  * Shingle rules mirror [[MinHashSig]]: windows of `shingleSize`
  * consecutive tokens joined by " " (concat_ws semantics), duplicate
  * shingles need no dedup — the min is unaffected.
  */
case class Md5MinHashSig(child: Expression, k: Int, shingleSize: Int)
    extends UnaryExpression {

  require(k > 0 && shingleSize > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_minhash_sig expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(tokens: Any): Any =
    Md5MinHashSig.compute(tokens.asInstanceOf[ArrayData], k, shingleSize)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5MinHashSig.compute($c, $k, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression)
      : Md5MinHashSig = copy(child = newChild)
}

object Md5MinHashSig {

  /** Mersenne prime 2^31−1 — must match Dedup.PortableMod. */
  val Mod: Long = 2147483647L

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel (called from generated code). */
  def compute(tokens: ArrayData, k: Int, shingleSize: Int)
      : GenericArrayData = {
    val numTok = tokens.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    val numWindows = math.max(numTok - shingleSize, 0) + 1
    val window = new Array[UTF8String](shingleSize)
    val digest = digestTL.get()
    var i = 0
    while (i < numWindows) {
      var w = 0
      while (w < shingleSize) {
        window(w) =
          if (i + w < numTok) tokens.getUTF8String(i + w) else null
        w += 1
      }
      val shingle = UTF8String.concatWs(sep, window: _*)
      digest.reset()
      val d = digest.digest(shingle.getBytes)
      // top 60 bits of the digest, big-endian = leading 15 hex chars
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      val h = (be >>> 4) % Mod
      var j = 0
      while (j < k) {
        val hh = (h * (2L * j + 1) + j.toLong * j) % Mod
        if (hh < sig(j)) sig(j) = hh
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
