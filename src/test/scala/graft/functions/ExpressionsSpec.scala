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
      graft.TestUdfs.rollingFingerprint($"text").as("viaUdf"))
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

  test("tier probe expressions COMPILE under codegen and agree with interpreted eval") {
    // GeneratePredicate.generate throws on a codegen compile error — this
    // pins the probes to whole-stage codegen instead of the silent
    // fall-back-to-interpreter path (which would still pass value checks)
    import graft.functions.expressions.{BloomMightContainExpr, CuckooContainsExpr}
    import graft.operators.{BlockedBloom, CuckooFilter}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.{BinaryType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    val bloom = BlockedBloom.sized(1000, 12)
    (0 until 100).foreach(i => bloom.add(s"u$i"))
    val bExpr = BloomMightContainExpr(
      BoundReference(0, BinaryType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    val bPred = GeneratePredicate.generate(bExpr) // throws if codegen breaks
    (0 until 100).foreach { i =>
      val row = InternalRow(bloom.toBytes, UTF8String.fromString(s"u$i"))
      assert(bPred.eval(row) && bExpr.eval(row) == true)
    }
    assert(!bPred.eval(InternalRow(null, UTF8String.fromString("u1"))),
      "null blob must probe as definitely-new")

    val cf = CuckooFilter.sized(1000)
    (0 until 100).foreach(i => cf.insert(s"c$i"))
    val cExpr = CuckooContainsExpr(
      BoundReference(0, BinaryType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    val cPred = GeneratePredicate.generate(cExpr)
    (0 until 100).foreach { i =>
      val row = InternalRow(cf.toBytes, UTF8String.fromString(s"c$i"))
      assert(cPred.eval(row) && cExpr.eval(row) == true)
      assert(cPred.eval(InternalRow(cf.toBytes, UTF8String.fromString(s"absent-far-$i")))
        == cf.contains(s"absent-far-$i"))
    }
  }
}
