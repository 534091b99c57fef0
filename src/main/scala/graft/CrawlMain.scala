package graft

import graft.pipeline.CrawlEngine
import graft.synth.WebConfig
import org.apache.spark.sql.SparkSession

/** CLI entry for the crawl engine (the spark-submit surface of the north
  * rule; in this sandbox launched via `sbt "runMain graft.CrawlMain ..."`).
  *
  * Usage: CrawlMain [nQueries] [batchSize] [nHosts] [storeDir] [cores]
  *                  [expandTopK] [seedFile] [configFile] [exportDir]
  *  - seedFile: one query per line (reference utils.py:30-32); overrides the
  *    synthesized nQueries seeds, order preserved (D2 anti-join keeps it)
  *  - configFile: flat `key: value` subset of the reference config.yaml
  *    (seed, n_hosts, results_per_page, pages, body_elems, batch_size,
  *    expand_top_k); overrides the positional knobs
  *  - exportDir: if set, writes the reference-shaped JSONL exports (links /
  *    images_metadata / text_markdown) after the run; the run timestamp
  *    enters HERE at the edge (GRAFT_RUN_TS_MICROS env for reproducible
  *    runs, else wall clock) — engine tables stay timestamp-free
  * Runs the full generation loop and prints per-generation counters plus
  * final table stats.
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val nQueries = args.lift(0).map(_.toInt).getOrElse(20)
    var batchSize = args.lift(1).map(_.toInt).getOrElse(8)
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

    var cfg = WebConfig(seed = 42, nHosts = nHosts)
    var expandTopK = args.lift(5).map(_.toInt).getOrElse(0)
    args.lift(7).foreach { path =>
      val c = graft.config.ConfigLoader.engineConfig(path)
      cfg = WebConfig(seed = c.seed, nHosts = c.nHosts,
        resultsPerPage = c.resultsPerPage, pages = c.pages, bodyElems = c.bodyElems)
      batchSize = c.batchSize
      expandTopK = c.expandTopK
    }
    val seeds = args.lift(6) match {
      case Some(path) => graft.config.ConfigLoader.loadSeeds(path)
      case None => (1 to nQueries).map(i => s"singapore topic $i query")
    }
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

    // table maintenance (GRAFT_MAINTAIN=1): compaction + history vacuum —
    // the between-runs job that keeps the snapshot tables from small-files
    // decay; correctness never depends on it
    if (sys.env.get("GRAFT_MAINTAIN").contains("1")) {
      val before = engine.seenT.currentSnapshot.map(_.files.size).getOrElse(0)
      val reclaimed = engine.maintain().values.sum
      val after = engine.seenT.currentSnapshot.map(_.files.size).getOrElse(0)
      println(s"[crawl] maintain: seen files $before -> $after, $reclaimed expired data files deleted")
    }

    // optional reference-shaped JSONL export (F6/F7) — timestamps render at
    // this edge only, never inside engine tables
    args.lift(8).foreach { exportDir =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val runTs = sys.env.get("GRAFT_RUN_TS_MICROS").map(_.toLong)
        .getOrElse(System.currentTimeMillis() * 1000L)
      val links = engine.linksT.read(spark)
        .getOrElse(Seq.empty[graft.model.Link].toDF())
      val images = engine.imagesT.read(spark)
        .getOrElse(Seq.empty[graft.oracle.SequentialOracle.OracleImage].toDF())
      // text_content = rendered markdown of the span sequence (F9)
      val mdDocs = engine.docsT.read(spark)
        .map(_.as[graft.model.PageDoc])
        .getOrElse(spark.emptyDataset[graft.model.PageDoc])
        .map(p => (p.page_url, p.page_title, p.page_summary,
          graft.functions.SpanExtractor.renderMarkdown(p.spans), p.generation))
        .toDF("page_url", "page_title", "page_summary", "text_content", "generation")
      val paths = graft.`export`.JsonlExport.writeRun(
        spark, exportDir, "run", runTs, links, images, mdDocs)
      println(s"[crawl] exported: ${paths.mkString(", ")}")
    }
    spark.stop()
  }
}
