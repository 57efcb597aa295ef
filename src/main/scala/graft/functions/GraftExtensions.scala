package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Registration of the engine's native expressions.
  *
  * Builder path: `.config("spark.sql.extensions",
  * "graft.functions.GraftExtensions")`. Existing-session path:
  * `GraftFunctions.register(spark)`. Either way,
  * `expr("minhash_sig(split(text, ' '), 32, 3)")` then works in SQL and
  * DataFrame code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.minhashSig)
    ext.injectFunction(GraftFunctions.md5MinhashSig)
    ext.injectFunction(GraftFunctions.vectorDot)
    ext.injectFunction(GraftFunctions.tokenEntropyMicro)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  val minhashSig: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => children match {
      case Seq(tokens, Literal(k: Int, IntegerType),
          Literal(n: Int, IntegerType)) =>
        MinHashSig(tokens, k, n)
      case _ => throw new IllegalArgumentException(
        "usage: minhash_sig(tokens array<string>, k int, shingleSize int)")
    })

  val md5MinhashSig: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("md5_minhash_sig"),
    new ExpressionInfo(classOf[Md5MinHashSig].getName, "md5_minhash_sig"),
    (children: Seq[Expression]) => children match {
      case Seq(tokens, Literal(k: Int, IntegerType),
          Literal(n: Int, IntegerType)) =>
        Md5MinHashSig(tokens, k, n)
      case _ => throw new IllegalArgumentException(
        "usage: md5_minhash_sig(tokens array<string>, k int, shingleSize int)")
    })

  val vectorDot: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => VectorDot(a, b)
      case _ => throw new IllegalArgumentException(
        "usage: vector_dot(a array<double>, b array<double>)")
    })

  val tokenEntropyMicro: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("token_entropy_micro"),
    new ExpressionInfo(classOf[TokenEntropyMicro].getName,
      "token_entropy_micro"),
    (children: Seq[Expression]) => children match {
      case Seq(tokens) => TokenEntropyMicro(tokens)
      case _ => throw new IllegalArgumentException(
        "usage: token_entropy_micro(tokens array<string>)")
    })

  def register(spark: SparkSession): Unit =
    Seq(minhashSig, md5MinhashSig, vectorDot, tokenEntropyMicro)
      .foreach { case (id, info, builder) =>
        org.apache.spark.sql.GraftBridge.registerFunction(spark, id, info,
          builder)
      }
}
