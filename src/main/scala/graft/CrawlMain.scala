package graft

import graft.pipeline.CrawlEngine
import graft.synth.WebConfig
import org.apache.spark.sql.SparkSession

/** CLI entry for the crawl engine (the spark-submit surface of the north
  * rule; in this sandbox launched via `sbt "runMain graft.CrawlMain ..."`).
  *
  * Usage: CrawlMain [nQueries] [batchSize] [nHosts] [storeDir] [cores]
  * Runs the full generation loop over a seeded synthetic frontier and prints
  * per-generation counters plus final table stats.
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val nQueries = args.lift(0).map(_.toInt).getOrElse(20)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(8)
    val nHosts = args.lift(2).map(_.toInt).getOrElse(200)
    val storeDir = args.lift(3).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-crawl").toString)
    val cores = args.lift(4).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = WebConfig(seed = 42, nHosts = nHosts)
    val seeds = (1 to nQueries).map(i => s"singapore topic $i query")
    val expandTopK = args.lift(5).map(_.toInt).getOrElse(0)
    val engine = new CrawlEngine(spark, cfg, storeDir, batchSize, expandTopK = expandTopK)

    val t0 = System.nanoTime()
    val rounds = engine.run(seeds)
    val secs = (System.nanoTime() - t0) / 1e9

    val seen = engine.seenSet().size
    val docs = engine.docs()
    val spans = docs.iterator.map(_.spans.size.toLong).sum
    println(f"[crawl] generations=$rounds queries=$nQueries store=$storeDir")
    println(f"[crawl] seen=$seen docs=${docs.size} spans=$spans wall=${secs}%.1fs " +
      f"urls_per_sec=${seen / secs}%.1f")
    docs.headOption.foreach { d =>
      println(s"[crawl] sample doc ${d.doc_id} ${d.page_url}")
      d.spans.take(6).foreach(s => println(s"  ${s.offset} ${s.kind}: ${s.text.take(70)}" +
        Option(s.media_ref).map(m => s" [$m]").getOrElse("")))
    }
    spark.stop()
  }
}
