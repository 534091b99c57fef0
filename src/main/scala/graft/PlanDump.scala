package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture aid for the optimization rounds: writes each named query's
  * `explain("formatted")` output to `<outDir>/<name>_<suffix>.txt`. Runs the
  * same session shape as the bench query leg (local[SPARK_GRAFT_CPUS],
  * 2×cores shuffle partitions) so the captured plans are the benched plans.
  * NOTE: the q_stream_* entries EXECUTE their drain while the query function
  * builds its result DataFrame — for those the captured plan is the final
  * read-back view; the per-batch plans are discussed in OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
