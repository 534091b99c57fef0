package graft.functions.expressions

import graft.util.Hashing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's scalar hot paths — the
  * upgrade path the task prescribes over Scala UDFs: a codegen'd
  * `Expression` stays inside whole-stage codegen (no ScalaUDF
  * serialization/row-boxing boundary).
  *
  * `RollingFingerprintExpr` is the document fingerprint (whitespace-
  * normalized Rabin-Karp polynomial over FNV offset basis — identical
  * semantics to TextAnalysis.rollingFingerprint's UDF, shared static
  * kernel). doGenCode emits a direct static call, the same pattern Spark's
  * own hash expressions use.
  */
case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprintExpr.fingerprint(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RollingFingerprintExpr.fingerprint($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

object RollingFingerprintExpr {
  /** Shared kernel (interpreted eval, codegen, and the legacy UDF all call
    * this): normalize whitespace+case, then h = h*257 + c over FNV offset.
    */
  def fingerprint(text: String): Long = {
    val s = if (text == null) "" else text.trim.toLowerCase.replaceAll("\\s+", " ")
    Hashing.poly257(s, 0, s.length)
  }
}

/** Registration of graft native functions into a session's function
  * registry — callable from SQL and via expr("..."); usable with
  * SparkSessionExtensions.injectFunction for spark-submit deployments.
  */
object GraftFunctions {
  private def litInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "rolling_fingerprint", exprs => RollingFingerprintExpr(exprs.head), "built-in")
    // URL-seen dedup tier (the analyzer wraps the AggregateFunction)
    r.createOrReplaceTempFunction(
      "bloom_agg", exprs => BloomBuildAgg(exprs(0), litInt(exprs(1)), litInt(exprs(2))), "built-in")
    r.createOrReplaceTempFunction(
      "bloom_or", exprs => BloomOrExpr(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => BloomMightContainExpr(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction(
      "cuckoo_contains", exprs => CuckooContainsExpr(exprs(0), exprs(1)), "built-in")
  }
}

/** spark-submit deployment hook:
  * `--conf spark.sql.extensions=graft.functions.expressions.GraftExtensions`
  * injects the native functions into every session of the application
  * (the SparkSessionExtensions path for cluster runs; local code calls
  * [[GraftFunctions.register]] directly).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingFingerprintExpr].getName, "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprintExpr(exprs.head)))
  }
}
