package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the optimizations the engine is designed
  * around must actually appear in the executed plans — predicate pushdown
  * to the parquet scan, column pruning, broadcast joins for dimensions,
  * whole-stage codegen on the hot paths. A plan regression fails the build,
  * not just the benchmark.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the plan (isFinalPlan=true)
    df.queryExecution.executedPlan.toString
  }

  /** Spark 4 marks whole-stage-codegen stages with a `*(n)` operator prefix
    * in the (final) executed plan.
    */
  private def hasCodegen(plan: String): Boolean = "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined

  test("q_anti_join: status filter is pushed to the parquet scan") {
    val plan = executedPlan("q_anti_join")
    val pushed = "PushedFilters: \\[[^\\]]*EqualTo\\(o_orderstatus,F\\)".r
    assert(pushed.findFirstIn(plan).isDefined, s"filter not pushed:\n$plan")
  }

  test("q_seed_filter: scan reads only the referenced columns") {
    val plan = executedPlan("q_seed_filter")
    // ReadSchema must contain doc_id, n_chars, text and nothing else
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(read.isDefined, s"no ReadSchema in:\n$plan")
    val cols = read.get.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("doc_id", "n_chars", "text"), s"column pruning failed: $cols")
  }

  test("q_join_agg: dimension joins broadcast (no shuffle join on nation/region)") {
    val plan = executedPlan("q_join_agg")
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$plan")
  }

  test("hot paths run inside WholeStageCodegen") {
    Seq("q1_agg", "q_first_seen_dedup", "q_text_stats", "q_dedup_exact").foreach { q =>
      val plan = executedPlan(q)
      assert(hasCodegen(plan), s"$q has no codegen span:\n$plan")
    }
  }

  test("q_ann_topk: the small query side is broadcast, not shuffled") {
    val plan = executedPlan("q_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
  }

  test("dedup tier probe runs inside whole-stage codegen, no ScalaUDF in the route") {
    import org.apache.spark.sql.functions._
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("href"))
    val nb = graft.operators.BlockedBloom.blocksFor(1000, 12)
    val bloomDf = docs.limit(100)
      .select(pmod(xxhash64(col("href")), lit(8)).cast("int").as("bucket"), col("href"))
      .groupBy("bucket").agg(expr(s"bloom_agg(href, $nb, 7)").as("bits"))
    val routed = docs
      .withColumn("bucket", pmod(xxhash64(col("href")), lit(8)).cast("int"))
      .join(broadcast(bloomDf), Seq("bucket"), "left")
      .filter(!expr("bloom_might_contain(bits, href)"))
    routed.collect()
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"probe fell back to a UDF:\n$plan")
    val probeLine = plan.linesIterator.find(_.contains("bloom_might_contain")).getOrElse("")
    assert("\\*\\(\\d+\\)".r.findFirstIn(probeLine).isDefined,
      s"probe filter not in a codegen stage:\n$plan")
  }

  test("crawl generation plan: dedup anti-join reuses the href hash partitioning") {
    // the first-seen window partitions by href; the following anti-join on
    // href must not introduce a second exchange of the candidate stream
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("href"), col("text"))
    val w = Window.partitionBy(col("href")).orderBy(col("text"))
    val firstSeen = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val seen = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("href"))
    val joined = firstSeen.join(seen, Seq("href"), "left_anti")
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(href".r.findAllIn(plan).size
    assert(exchanges <= 2, s"candidate stream exchanged more than once per side:\n$plan")
  }
}
