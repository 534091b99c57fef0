package graft.pipeline

import graft.SparkTestSession
import graft.oracle.SequentialOracle
import graft.synth.WebConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The BASELINE.json completeness criteria, verbatim: same seed list +
  * politeness budget ⇒ engine crawl order == oracle order, URL-seen set
  * equality, per-row span-sequence equality on (kind, text, media_ref,
  * order) — plus resume equivalence and partition-count stability.
  */
class OracleEngineParitySpec extends AnyFunSuite {

  val cfg = WebConfig(seed = 42, nHosts = 50, resultsPerPage = 8, pages = 1)
  val seeds: Seq[String] = (1 to 12).map(i => s"singapore topic $i query") ++ Seq("", "  ")
  val batchSize = 5

  lazy val oracle: SequentialOracle.OracleResult =
    SequentialOracle.run(cfg, seeds, batchSize)

  private def newEngine(dir: String): CrawlEngine =
    new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize)

  private def tempDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  test("end-to-end: URL-seen set, crawl order, span sequences, counters match the oracle") {
    val dir = tempDir("e2e")
    val eng = newEngine(dir)
    val rounds = eng.run(seeds)
    assert(rounds == 3) // ceil(12/5)

    // URL-seen set equality
    assert(eng.seenSet() == oracle.seen)

    // crawl order equality (fetch schedule)
    assert(eng.crawlOrder() == oracle.crawlOrder)

    // span-sequence equality per doc on (kind, text, media_ref, order)
    val engDocs = eng.docs().map(d => d.doc_id -> d).toMap
    val oraDocs = oracle.docs.map(d => d.doc_id -> d).toMap
    assert(engDocs.keySet == oraDocs.keySet)
    oraDocs.foreach { case (id, od) =>
      val ed = engDocs(id)
      assert(ed.spans == od.spans, s"span mismatch for ${od.page_url}")
      assert(ed.page_title == od.page_title && ed.page_summary == od.page_summary)
    }
    assert(oraDocs.nonEmpty, "fixture must actually produce documents")
    assert(oraDocs.values.exists(_.spans.exists(_.kind == "image")),
      "fixture must produce interleaved image spans")

    // pdf + counters
    val spark = SparkTestSession.spark
    import spark.implicits._
    val engPdfs = eng.pdfT.read(spark).map(_.select("url").as[String].collect().toSet).getOrElse(Set.empty)
    assert(engPdfs == oracle.pdfUrls.toSet)
    val m = eng.metricsT.read(spark).get.as[(String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(m("added") == oracle.counters("added"))
    assert(m("skipped") == oracle.counters("skipped"))
    assert(m("docs") == oracle.counters("fetched"))
    assert(m("robots_blocked") == oracle.counters("robots_blocked"))

    // processed queries: all non-blank seeds, checkpointed
    val processed = eng.processedQueries()
    assert(processed == oracle.processedQueries.toSet)

    // per-partition lineage sums to the generation totals
    import org.apache.spark.sql.functions.sum
    val pm = eng.partitionMetricsT.read(spark).get
    assert(pm.agg(sum("docs")).as[Long].head() == oracle.counters("fetched"))
    assert(pm.agg(sum("spans")).as[Long].head() ==
      oracle.docs.iterator.map(_.spans.size.toLong).sum)

    // images table equals the reference images_metadata records (multiset)
    val engImages = eng.imagesT.read(spark).get
      .as[graft.oracle.SequentialOracle.OracleImage].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val oraImages = oracle.images.groupBy(identity).view.mapValues(_.length).toMap
    assert(engImages == oraImages)
    assert(oraImages.nonEmpty, "fixture must produce image records")
  }

  test("over-budget tiers: zero byte budget skips cuckoo builds and bloom broadcast, parity holds") {
    // tierBroadcastBytes=1 puts EVERY hot host over the per-host budget (no
    // cuckoo filter is ever built) and forces the bloom probe join onto the
    // co-partitioned (non-broadcast) path — routing tiers are accelerators,
    // so the exact anti-join must keep the seen set oracle-equal
    val dir = tempDir("overbudget")
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize,
      hotHostCount = 3, tierBroadcastBytes = 1L)
    eng.run(seeds)
    assert(eng.seenSet() == oracle.seen)
    assert(eng.crawlOrder() == oracle.crawlOrder)
    assert(eng.cuckooT.currentSnapshot.forall(_.rowCount == 0),
      "no cuckoo filter may be built under a zero byte budget")
  }

  test("runtime semi-filter on the seen side (forced on): parity holds") {
    // seenSemiFilterRows=1 forces the maybe-bloom reduction of the anti-
    // join's seen side in every generation after the first — the seen set
    // and crawl order must be unchanged (the filter only sheds rows the
    // exact join would not match anyway; FPs shuffle, never drop)
    val dir = tempDir("semifilter")
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize,
      seenSemiFilterRows = 1L)
    eng.run(seeds)
    assert(eng.seenSet() == oracle.seen)
    assert(eng.crawlOrder() == oracle.crawlOrder)
  }

  test("over-budget host tables + expansion: gated broadcasts fall back to plain joins, parity holds") {
    // tierBroadcastBytes=1 forces EVERY gated broadcast off — bloom tier,
    // host profiles, host_state, and the expansion path's semi-filter —
    // onto plain key joins; results must be oracle-identical (gates route
    // the plan, never decide membership)
    val oracleExp = SequentialOracle.run(cfg, seeds, batchSize, expandTopK = 3)
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, tempDir("hostgate"),
      batchSize, tierBroadcastBytes = 1L, expandTopK = 3)
    eng.run(seeds)
    assert(eng.seenSet() == oracleExp.seen)
    assert(eng.crawlOrder() == oracleExp.crawlOrder)
  }

  test("forced semi-filter + expansion: frontier/discovery anti-joins stay oracle-equal") {
    // seenSemiFilterRows=1 forces the maybe-bloom reduction inside
    // antiJoinSeen for BOTH the pick path and the discovery path from the
    // first generation with a seen table
    val oracleExp = SequentialOracle.run(cfg, seeds, batchSize, expandTopK = 3)
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, tempDir("semiexp"),
      batchSize, seenSemiFilterRows = 1L, expandTopK = 3)
    eng.run(seeds)
    assert(eng.seenSet() == oracleExp.seen)
    assert(eng.crawlOrder() == oracleExp.crawlOrder)
    assert(eng.docs().map(d => d.doc_id -> d.spans).toMap ==
      oracleExp.docs.map(d => d.doc_id -> d.spans).toMap)
  }

  test("maintain after a crash mid-generation: fold sees only committed state, resume stays oracle-equal") {
    // regression: foldFrontier used to read the UNCOMMITTED seen delta of a
    // crashed generation and stamp the folded frontier with the committed
    // generation — the aborted generation's picks then survived rollback in
    // neither seen nor the frontier. maintain() must roll back first.
    val oracleExp = SequentialOracle.run(cfg, seeds, batchSize, expandTopK = 3)
    val dir = tempDir("maintain-crash")
    val eng1 = new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize, expandTopK = 3)
    eng1.run(seeds, maxRounds = 1)
    // simulate a crash: partial generation-2 commits (seen delta + frontier
    // append) that never reached the processed_queries barrier
    val spark = SparkTestSession.spark
    import spark.implicits._
    eng1.seenT.append(Seq(("https://junk.example/x", "junk.example")).toDF("href", "host"), 2)
    eng1.frontierT.append(Seq(("https://junk.example/y", "junk.example", 0.5, 2))
      .toDF("url", "host", "score", "discovered_gen"), 2)
    // maintenance BETWEEN runs, on the crashed store
    val eng2 = new CrawlEngine(spark, cfg, dir, batchSize, expandTopK = 3)
    eng2.maintain()
    assert(!eng2.seenSet().contains("https://junk.example/x"),
      "maintain must discard the unbarriered partial generation")
    val eng3 = new CrawlEngine(spark, cfg, dir, batchSize, expandTopK = 3)
    eng3.run(seeds)
    assert(eng3.seenSet() == oracleExp.seen)
    assert(eng3.crawlOrder() == oracleExp.crawlOrder)
  }

  test("auto-maintenance cadence: tiered seen compaction inside run(), parity + resume hold") {
    // batch 2 → 6 generations; cadence 2 → the tiered fold fires after
    // nearly every generation, so parity here pins that a mid-run fold
    // never perturbs dedup, ordering, or resume
    val batch2 = 2
    val oracle2 = SequentialOracle.run(cfg, seeds, batch2)
    val dir = tempDir("automaint")
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, dir, batch2,
      autoMaintainSeenDirs = 2)
    eng.run(seeds)
    assert(eng.seenT.commitDirCount <= 2, "cadence must bound the chain length")
    assert(eng.seenSet() == oracle2.seen)
    assert(eng.crawlOrder() == oracle2.crawlOrder)
    // resume on the maintained store: nothing to do, state intact
    val engR = new CrawlEngine(SparkTestSession.spark, cfg, dir, batch2,
      autoMaintainSeenDirs = 2)
    assert(engR.run(seeds) == 0)
    assert(engR.seenSet() == oracle2.seen)
    // interrupt BETWEEN cadence ticks, then finish with a fresh engine
    val dir2 = tempDir("automaint-resume")
    new CrawlEngine(SparkTestSession.spark, cfg, dir2, batch2,
      autoMaintainSeenDirs = 2).run(seeds, maxRounds = 3)
    val engB = new CrawlEngine(SparkTestSession.spark, cfg, dir2, batch2,
      autoMaintainSeenDirs = 2)
    engB.run(seeds)
    assert(engB.seenSet() == oracle2.seen)
    assert(engB.crawlOrder() == oracle2.crawlOrder)
  }

  test("maintain (compact + vacuum) between runs: state identical, resume still a no-op") {
    val dir = tempDir("maintain")
    val eng = newEngine(dir)
    eng.run(seeds)
    val filesBefore = eng.seenT.currentSnapshot.get.files.size
    val report = eng.maintain(targetFileBytes = 1L << 30) // pack each table to 1 file
    assert(report.values.sum > 0, "vacuum must reclaim expired snapshot files")
    assert(eng.seenT.currentSnapshot.get.files.size <= filesBefore)
    // observable state unchanged by maintenance
    assert(eng.seenSet() == oracle.seen)
    assert(eng.crawlOrder() == oracle.crawlOrder)
    // resume on the maintained store: nothing to do, state intact
    val eng2 = newEngine(dir)
    assert(eng2.run(seeds) == 0)
    assert(eng2.seenSet() == oracle.seen)
  }

  test("resume with an active frontier: stop after generation 1, finish identically") {
    val oracleExp = SequentialOracle.run(cfg, seeds, batchSize, expandTopK = 3)
    val dir = tempDir("resume-exp")
    val eng1 = new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize, expandTopK = 3)
    eng1.run(seeds, maxRounds = 1)
    // simulate a crash: partial generation-2 commits (incl. a frontier
    // replace) that never reached the barrier must roll back on resume
    val spark = SparkTestSession.spark
    import spark.implicits._
    eng1.frontierT.replace(Seq(("https://junk.example/x", "junk.example", 0.5, 2))
      .toDF("url", "host", "score", "discovered_gen"), 2)
    val eng2 = new CrawlEngine(spark, cfg, dir, batchSize, expandTopK = 3)
    eng2.run(seeds)
    assert(eng2.seenSet() == oracleExp.seen)
    assert(eng2.crawlOrder() == oracleExp.crawlOrder)
    assert(eng2.docs().map(d => d.doc_id -> d.spans).toMap ==
      oracleExp.docs.map(d => d.doc_id -> d.spans).toMap)
  }

  test("parity holds on a different universe (seed/hosts/batch) with expansion") {
    val cfg2 = WebConfig(seed = 1234, nHosts = 23, resultsPerPage = 6, pages = 1)
    val seeds2 = (1 to 9).map(i => s"sg query $i")
    val ora2 = SequentialOracle.run(cfg2, seeds2, batchSize = 4, expandTopK = 2)
    val eng2 = new CrawlEngine(SparkTestSession.spark, cfg2, tempDir("alt"),
      batchSize = 4, saltShards = 2, hotHostCount = 3, expandTopK = 2)
    eng2.run(seeds2)
    assert(eng2.seenSet() == ora2.seen)
    assert(eng2.crawlOrder() == ora2.crawlOrder)
    assert(eng2.docs().map(d => d.doc_id -> d.spans).toMap ==
      ora2.docs.map(d => d.doc_id -> d.spans).toMap)
  }

  test("partition-count stability: same results at different shuffle parallelism") {
    val spark = SparkTestSession.spark
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val eng = newEngine(tempDir("p7"))
      eng.run(seeds)
      assert(eng.crawlOrder() == oracle.crawlOrder)
      assert(eng.seenSet() == oracle.seen)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("resume equivalence: stop after generation 1, new engine instance finishes identically") {
    val dir = tempDir("resume")
    val eng1 = newEngine(dir)
    eng1.run(seeds, maxRounds = 1)
    assert(eng1.lastCommittedGeneration == 1)
    // fresh instance (fresh Bloom rebuilt from the seen table) resumes
    val eng2 = newEngine(dir)
    eng2.run(seeds)
    assert(eng2.seenSet() == oracle.seen)
    assert(eng2.crawlOrder() == oracle.crawlOrder)
    assert(eng2.docs().map(_.doc_id).toSet == oracle.docs.map(_.doc_id).toSet)
  }

  test("crash mid-generation: partial commits roll back to the barrier") {
    val dir = tempDir("crash")
    val eng = newEngine(dir)
    eng.run(seeds, maxRounds = 1)
    // simulate a crash AFTER some table commits of generation 2 but BEFORE
    // the processed_queries barrier: append junk to seen as generation 2
    val spark = SparkTestSession.spark
    import spark.implicits._
    eng.seenT.append(Seq(("https://junk.example/x", "junk.example")).toDF("href", "host"), 2)
    val eng2 = newEngine(dir)
    eng2.run(seeds)
    assert(eng2.seenSet() == oracle.seen, "rolled-back partial generation must not leak")
    assert(eng2.crawlOrder() == oracle.crawlOrder)
  }

  test("dedup idempotence: re-running the same seeds is a no-op") {
    val dir = tempDir("idem")
    val eng = newEngine(dir)
    eng.run(seeds)
    val seenBefore = eng.seenSet()
    val docsBefore = eng.docs().size
    val eng2 = newEngine(dir)
    val extra = eng2.run(seeds)
    assert(extra == 0, "all queries processed → no further generations")
    assert(eng2.seenSet() == seenBefore && eng2.docs().size == docsBefore)
  }

  test("mega-host salting: saltShards=8 changes physical partitioning only, not results") {
    val dir = tempDir("salt")
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, dir, batchSize, saltShards = 8)
    eng.run(seeds)
    assert(eng.seenSet() == oracle.seen)
    assert(eng.crawlOrder() == oracle.crawlOrder)
    assert(eng.docs().map(d => d.doc_id -> d.spans).toMap ==
      oracle.docs.map(d => d.doc_id -> d.spans).toMap)
  }

  test("priority-frontier expansion: engine matches the oracle with expandTopK=3") {
    val oracleExp = SequentialOracle.run(cfg, seeds, batchSize, expandTopK = 3)
    val expandDir = tempDir("expand")
    val eng = new CrawlEngine(SparkTestSession.spark, cfg, expandDir,
      batchSize, expandTopK = 3)
    eng.run(seeds)
    assert(oracleExp.counters("expanded") > 0, "fixture must actually expand links")
    assert(eng.seenSet() == oracleExp.seen)
    assert(eng.crawlOrder() == oracleExp.crawlOrder)
    val engDocs = eng.docs().map(d => d.doc_id -> d.spans).toMap
    assert(engDocs == oracleExp.docs.map(d => d.doc_id -> d.spans).toMap)
    // expansion must have produced docs beyond the search-driven set
    assert(oracleExp.docs.size > oracle.docs.size)
    // the frontier is a DELTA log: per-generation commits append only
    // discoveries and leave picked rows dead (their urls are in seen) —
    // maintain() folds them out physically; afterwards everything left in
    // the table is genuinely unseen/unpicked
    val spark = SparkTestSession.spark
    import spark.implicits._
    val withDead = eng.frontierT.read(spark).get.select($"url").as[String].collect().toSet
    eng.maintain()
    val frontierUrls = eng.frontierT.read(spark).get.select($"url").as[String].collect().toSet
    assert(frontierUrls.intersect(oracleExp.seen).isEmpty)
    assert((withDead -- frontierUrls).subsetOf(oracleExp.seen),
      "folding may only remove seen (dead) rows")
    // the fold must not change observable crawl results on resume
    val eng3 = new CrawlEngine(spark, cfg, expandDir, batchSize, expandTopK = 3)
    assert(eng3.run(seeds) == 0)
    assert(eng3.seenSet() == oracleExp.seen)
  }

  test("politeness invariant: consecutive fetches per host spaced >= min_delay") {
    val byHost = oracle.fetchEvents.groupBy(_.host)
    byHost.foreach { case (host, evs) =>
      val times = evs.map(_.scheduled_ms).sorted
      times.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= evs.head.min_delay_ms, s"host $host violates min delay")
        case _ => ()
      }
    }
    assert(byHost.nonEmpty)
  }
}
