package graft

import graft.pipeline.CrawlEngine
import graft.synth.WebConfig
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Emits ONE JSON line:
  *   metric/value/unit  — headline: URLs fetched+deduped per second for the
  *                        full crawl pipeline at `cpus` cores
  *   queries            — per-query wall seconds for every SparkEntry query
  *                        on SPARK_GRAFT_SF_DIR
  *   crawl              — the two-parallelism scaling evidence the north
  *                        rule requires (sandbox proxy for N vs 4N
  *                        executors): identical workload at local[lo] and
  *                        local[hi], throughputs + efficiency
  *                        (thrpt_hi / thrpt_lo) / (hi / lo)
  *
  * The synthetic frontier's logical URL-id space is ~nHosts × pageCount ≈
  * 10^7 per 10^4 hosts slice of the 10^10 design space; the bench
  * materializes only each generation's working set (like the real engine
  * would), so the workload size is governed by queries × pages ×
  * resultsPerPage, not the id-space size.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def crawlBench(cores: Int, nQueries: Int, batch: Int, cfg: WebConfig): (Double, Long) = {
    val spark = session(cores)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-bench-$cores").toString
    val engine = new CrawlEngine(spark, cfg, dir, batch,
      bloomExpectedKeys = 4L * nQueries * cfg.resultsPerPage * cfg.pages)
    val seeds = (1 to nQueries).map(i => s"singapore topic $i query")
    val t0 = System.nanoTime()
    engine.run(seeds)
    val secs = (System.nanoTime() - t0) / 1e9
    val seen = engine.seenT.currentSnapshot.map(_.rowCount).getOrElse(0L)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (seen / secs, seen)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = sys.env.getOrElse("BENCH_LO_CPUS", "8").toInt
    val nQueries = sys.env.getOrElse("BENCH_QUERIES", "1000").toInt
    val batch = sys.env.getOrElse("BENCH_BATCH", "500").toInt
    val cfg = WebConfig(
      seed = 42,
      nHosts = sys.env.getOrElse("BENCH_HOSTS", "20000").toInt,
      resultsPerPage = sys.env.getOrElse("BENCH_RPP", "150").toInt,
      pages = sys.env.getOrElse("BENCH_PAGES", "2").toInt)

    // ---- per-query timings on the sf dir ----
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- crawl throughput at two parallelism levels (scaling evidence) ----
    val (thrLo, _) = crawlBench(lo, nQueries, batch, cfg)
    val (thrHi, seenHi) = crawlBench(cpus, nQueries, batch, cfg)
    val efficiency = (thrHi / thrLo) / (cpus.toDouble / lo)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val totalQ = results.map(_._2).sum
    println(
      f"""{"metric":"urls_fetched_deduped_per_sec","value":$thrHi%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","total_queries_sec":$totalQ%.1f,"crawl":{"cores_lo":$lo,"cores_hi":$cpus,"throughput_lo":$thrLo%.1f,"throughput_hi":$thrHi%.1f,"scaling_efficiency":$efficiency%.3f,"urls_seen":$seenHi,"queries":$nQueries,"results_per_page":${cfg.resultsPerPage},"pages":${cfg.pages},"hosts":${cfg.nHosts}}}""")
  }
}
