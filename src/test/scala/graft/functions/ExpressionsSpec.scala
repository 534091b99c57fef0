package graft.functions

import graft.SparkTestSession
import graft.functions.expressions.{GraftFunctions, RollingFingerprintExpr}
import graft.ml.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rolling_fingerprint expression: SQL-callable, equals the UDF, codegen'd") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "The  Quick Fox"), (2L, "other doc"), (3L, ""))
      .toDF("id", "text")
    val both = df.select($"id",
      expr("rolling_fingerprint(text)").as("native"),
      TextAnalysis.rollingFingerprint($"text").as("viaUdf"))
    both.collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))

    // normalization semantics
    assert(RollingFingerprintExpr.fingerprint("  a  B ") ==
      RollingFingerprintExpr.fingerprint("a b"))
    assert(RollingFingerprintExpr.fingerprint("a") !=
      RollingFingerprintExpr.fingerprint("b"))

    // the native form must not appear as a ScalaUDF / BatchEval node
    val native = df.select(expr("rolling_fingerprint(text)"))
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"expression fell back to UDF:\n$plan")

    // SQL surface
    df.createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql("SELECT rolling_fingerprint(text) AS f FROM fp_docs ORDER BY id")
      .as[Long].collect()
    assert(viaSql.length == 3)

    // null flows through as null (UnaryExpression default null handling)
    val withNull = Seq[(Long, String)]((1L, null)).toDF("id", "text")
      .select(expr("rolling_fingerprint(text)")).collect()
    assert(withNull.head.isNullAt(0))
  }
}
