package graft.pipeline

import graft.model._
import graft.operators.BlockedBloom
import graft.oracle.SequentialOracle
import graft.snapshot.{SnapshotStore, SnapshotTable}
import graft.synth.{SyntheticWeb, WebConfig}
import graft.functions.{Predicates, SpanExtractor, UrlFunctions}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The Spark-native crawl frontier + fetch scheduler (SURVEY §3.4). One
  * generation = one declarative DAG:
  *
  * {{{
  * batch queries (driver, seeded shuffle — main.py:61-65 normalized)
  *  → flatMap synthetic search (S4/S5/G4)                        [narrow]
  *  → first-seen-wins window over ArrivalKey (D1 intra-batch)    [shuffle 1: hash(href)]
  *  → Bloom-routed exact anti-join vs seen (D1/J2)               [reuses shuffle 1 partitioning]
  *  → relevance predicate (P4), PDF split (P5/S7/D3/J4)          [narrow]
  *  → robots gate + per-host politeness schedule (window)        [shuffle 2: hash(host)]
  *  → salted repartition → fetch + span extraction (S6/G1/G2/G5) [shuffle 3: hash(host,salt)]
  *  → snapshot commits: seen+Δ links+Δ docs+Δ images+Δ pdf+Δ
  *    metrics+Δ host_state, processed_queries LAST (K3 barrier)
  * }}}
  *
  * Scale design notes:
  *  - the Bloom tier (blocked, FNV-1a+murmur3, built per-partition and
  *    OR-merged) routes definitely-new URLs around the anti-join shuffle; at
  *    10^10-URL frontier scale the overwhelming majority of dup probes die
  *    in the broadcast filter, the exact anti-join stays the authority so
  *    the final seen set equals the reference's;
  *  - politeness is a window over hash(host) partitioning: slot j of host h
  *    is scheduled at next_free(h) + j*min_delay(h) — per-host state never
  *    crosses partitions;
  *  - mega-host skew: the fetch stage repartitions on (host, salt) with
  *    salt = hash(url) % saltShards, splitting a hot host's fetch work
  *    across tasks WITHOUT violating the per-host schedule (scheduled times
  *    are already assigned; shards only execute);
  *  - every count used for counters is taken from a persisted Dataset so
  *    no stage re-executes nondeterministically.
  *
  * Crash consistency: processed_queries commits last; [[rollbackPartial]]
  * time-travels every other table back to the last fully-committed
  * generation on restart, giving exactly the reference's observable
  * idempotent-resume semantics (tracker replay + master replay,
  * main.py:43-49, crawler.py:31-40) but atomically.
  */
final class CrawlEngine(
    spark: SparkSession,
    cfg: WebConfig,
    storeRoot: String,
    batchSize: Int,
    saltShards: Int = 4,
    bloomBitsPerKey: Int = 12,
    bloomExpectedKeys: Long = 1L << 20,
    hotHostCount: Int = 8,
    expandTopK: Int = 0) extends Serializable {

  import spark.implicits._

  @transient private val store = SnapshotStore(storeRoot)
  @transient val seenT: SnapshotTable = store.table("seen")
  @transient val linksT: SnapshotTable = store.table("links")
  @transient val docsT: SnapshotTable = store.table("documents")
  @transient val imagesT: SnapshotTable = store.table("images")
  @transient val pdfT: SnapshotTable = store.table("pdf_urls")
  @transient val processedT: SnapshotTable = store.table("processed_queries")
  @transient val hostStateT: SnapshotTable = store.table("host_state")
  @transient val metricsT: SnapshotTable = store.table("metrics")
  @transient val eventsT: SnapshotTable = store.table("fetch_events")
  @transient val frontierT: SnapshotTable = store.table("frontier")
  @transient val partitionMetricsT: SnapshotTable = store.table("partition_metrics")

  /** Synthetic robots/politeness host-profile table, broadcast to every
    * generation (north rule: robots rules evaluated from a host table
    * joined on host, not per-row callbacks). nHosts rows — always a BHJ.
    */
  @transient private lazy val hostProfilesDf: DataFrame = {
    import spark.implicits._
    SyntheticWeb.allHosts(cfg).toDF()
      .select($"host", $"min_delay_ms", $"robots_disallow")
  }

  /** robots gate as a codegen'd higher-order predicate over the joined
    * disallow-prefix array (no UDF): allowed iff no disallow prefix matches
    * the URL path.
    */
  private def robotsAllowedCol(urlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val path = regexp_extract(urlCol, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    !exists(coalesce(col("robots_disallow"), array()),
      p => startswith(path, p))
  }

  /** Driver-resident Bloom prefilter over the seen table; rebuilt from the
    * table on startup (resume), incrementally extended per generation.
    */
  @transient private var bloom: BlockedBloom = _

  /** Exact cuckoo tier for hot hosts (north rule): the top-k hosts by
    * frontier mass this generation keep a per-host cuckoo filter whose
    * NEGATIVE answers are exact (while unsaturated) — their high-collision
    * URL traffic routes around both the Bloom's false positives and the
    * anti-join shuffle. Built lazily per host from the seen table, extended
    * with each generation's new URLs; delete support is what distinguishes
    * the cuckoo from the Bloom tier (eviction/re-crawl workflows).
    */
  @transient private var cuckoos: Map[String, graft.operators.CuckooFilter] = Map.empty

  private def initBloom(): Unit = if (bloom == null) {
    val expected = math.max(bloomExpectedKeys,
      seenT.currentSnapshot.map(_.rowCount * 4).getOrElse(0L))
    bloom = BlockedBloom.sized(expected, bloomBitsPerKey)
    seenT.read(spark).foreach { df =>
      bloom.merge(BlockedBloom.buildLike(df.select($"href").as[String], bloom))
    }
  }

  def lastCommittedGeneration: Int =
    processedT.currentSnapshot.map(_.generation).getOrElse(0)

  /** Roll every table back to the last generation whose processed_queries
    * barrier committed (T2/T3 resume semantics).
    */
  def rollbackPartial(): Unit = {
    val committed = lastCommittedGeneration
    Seq(seenT, linksT, docsT, imagesT, pdfT, hostStateT, metricsT, eventsT,
      frontierT, partitionMetricsT).foreach(_.rollbackToGeneration(committed))
  }

  def processedQueries(): Set[String] =
    processedT.read(spark).map(_.select($"query").as[String].collect().toSet).getOrElse(Set.empty)

  /** Full run: the reference batch loop (main.py:54-104). Returns the number
    * of generations executed.
    */
  def run(seedQueries: Seq[String], maxRounds: Int = Int.MaxValue): Int = {
    rollbackPartial()
    initBloom()
    var round = lastCommittedGeneration
    var executed = 0
    var remaining = currentRemaining(seedQueries)
    while (remaining.nonEmpty && executed < maxRounds) {
      round += 1
      val shuffled = remaining.sortBy(q => (SequentialOracle.shuffleRank(cfg.seed, round, q), q))
      val batch = shuffled.take(batchSize)
      runGeneration(round, batch)
      remaining = shuffled.drop(batchSize)
      executed += 1
    }
    executed
  }

  /** D2: seed order preserved, processed queries anti-filtered (main.py:48).
    * Seed lists are driver-resident in the reference too; the processed set
    * is read from the snapshot table.
    */
  private def currentRemaining(seedQueries: Seq[String]): Vector[String] = {
    val processed = processedQueries()
    seedQueries.iterator.map(_.trim).filter(_.nonEmpty).filterNot(processed).toVector
  }

  /** One generation DAG. Batch is small (driver-held, like the reference's
    * batch list); everything downstream is distributed.
    */
  def runGeneration(round: Int, batch: Seq[String]): Map[String, Long] = {
    initBloom()
    val webCfg = cfg
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // phase timing (env GRAFT_PHASE_TIMING=1): finds serial driver floors
    val timing = sys.env.get("GRAFT_PHASE_TIMING").contains("1")
    var tLast = System.nanoTime()
    def lap(name: String): Unit = if (timing) {
      val now = System.nanoTime()
      println(f"[gen $round] $name%-18s ${(now - tLast) / 1e9}%6.2fs")
      tLast = now
    }

    // ---- G4: search fan-out (both kinds, all pages) --------------------
    val batchDs = spark.createDataset(batch.zipWithIndex.map { case (q, i) => (q, i) })
    val candidates: Dataset[Link] = batchDs.flatMap { case (query, qRank) =>
      for {
        kind <- 0 to 1
        page <- 1 to webCfg.pages
        // crawler.py:80 pageno bug: general search always requests cfg.pages
        effPage = if (kind == 1) page else webCfg.pages
        (hit, rRank) <- SyntheticWeb.searchHits(webCfg, query, effPage, kind == 1).zipWithIndex
        if hit.url != null && hit.url.nonEmpty // P3
      } yield Link(hit.title, hit.url, hit.content, query, effPage, hit.engine,
        if (kind == 1) Some("image") else None, hit.img_src, hit.thumbnail_src,
        round, qRank, kind, rRank, UrlFunctions.hostOf(hit.url))
    }
    // NOT persisted: the candidate stream is a deterministic flatMap over a
    // tiny driver list — recomputing it for its consumers costs far less
    // than caching millions of Link rows (memory pressure at bench scale).
    // One pass yields both the total count and the per-host mass (hot-host
    // selection) — no second scan. The collect is O(distinct hosts touched
    // this generation); at extreme host cardinality switch to a server-side
    // orderBy/limit for hotNow plus df.observe for the total.
    val hostCounts = candidates.toDF().groupBy($"host").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nCandidates = hostCounts.iterator.map(_._2).sum
    lap("candidates")

    // ---- D1: intra-batch first-seen-wins on deterministic ArrivalKey ----
    val arrival = Seq($"kind", $"query_rank", $"page", $"result_rank")
    val wHref = Window.partitionBy($"href").orderBy(arrival: _*)
    val firstSeen = candidates.toDF()
      .withColumn("rn", row_number().over(wHref)).filter($"rn" === 1).drop("rn")

    // ---- D1/J2: tiered routing (cuckoo hot tier → Bloom → exact anti-join)
    // Hot hosts this generation = top-k by candidate mass; ensure each has
    // a cuckoo filter seeded from the seen table (lazy, cached across
    // generations). Routing never decides membership positively: any
    // "maybe seen" goes through the exact anti-join, so FPs cost a shuffled
    // row, never a dropped URL.
    val hotNow = hostCounts.sortBy { case (h, n) => (-n, h) }
      .take(hotHostCount).map(_._1).toSet
    val missing = hotNow -- cuckoos.keySet
    if (missing.nonEmpty) {
      val seedRows: Map[String, Array[String]] = seenT.read(spark) match {
        case None => Map.empty
        case Some(seenDf) =>
          seenDf.filter($"host".isin(missing.toSeq: _*))
            .select($"host", $"href").as[(String, String)].collect()
            .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      }
      cuckoos = cuckoos ++ missing.map { h =>
        val urls = seedRows.getOrElse(h, Array.empty[String])
        val cf = graft.operators.CuckooFilter.sized(math.max(1024L, urls.length * 4L))
        urls.foreach(cf.insert)
        h -> cf
      }
    }
    lap("cuckoo-seed")
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val cuckooBc = spark.sparkContext.broadcast(cuckoos)
    val mightContain = udf { (href: String, host: String) =>
      cuckooBc.value.get(host) match {
        case Some(cf) if cf.negativesAreExact => cf.contains(href)
        case _ => bloomBc.value.mightContain(href)
      }
    }
    val newLinks = (seenT.read(spark) match {
      case None => firstSeen
      case Some(seenDf) =>
        val defNew = firstSeen.filter(!mightContain($"href", $"host"))
        val maybe = firstSeen.filter(mightContain($"href", $"host"))
          .join(seenDf.select($"href"), Seq("href"), "left_anti")
        defNew.unionByName(maybe)
    }).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- P4: relevance gate (deterministic 2-of-3 vote) ----------------
    val kept = newLinks
      .filter(Predicates.isRelevantCol($"title", $"href", $"content"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- P5/S7/D3: PDF split -------------------------------------------
    val confirmsPdf = udf((u: String) => SyntheticWeb.confirmsPdf(webCfg, u))
    val isPdf = Predicates.isLikelyPdfUrlCol($"href") && confirmsPdf($"href")
    val pdfLinks = kept.filter(isPdf)
    val htmlLinks = kept.filter(!isPdf)

    // ---- O5: priority-frontier expansion picks (north rule) ------------
    // per-host top-K not-yet-seen, robots-allowed frontier links by
    // (score desc, url): hash(host) partitioning + in-partition sort — no
    // global ordering anywhere.
    val emptyFrontier = Seq.empty[(String, String, Double, Int)]
      .toDF("url", "host", "score", "discovered_gen")
    val oldFrontier = frontierT.read(spark).getOrElse(emptyFrontier)
    val picks = if (expandTopK <= 0) {
      emptyFrontier.select($"url".as("href"), $"host", $"score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    } else {
      val seenAll = (seenT.read(spark) match {
        case Some(s) => s.select($"href")
        case None => Seq.empty[String].toDF("href")
      }).unionByName(newLinks.select($"href"))
      val wFrontier = Window.partitionBy($"host").orderBy($"score".desc, $"url")
      oldFrontier
        .join(seenAll.withColumnRenamed("href", "url"), Seq("url"), "left_anti")
        .join(broadcast(hostProfilesDf.select($"host", $"robots_disallow")), Seq("host"), "left")
        .filter(robotsAllowedCol($"url")).drop("robots_disallow")
        .withColumn("rn", row_number().over(wFrontier)).filter($"rn" <= expandTopK)
        .select($"url".as("href"), $"host", $"score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nExpanded = picks.count()
    lap("picks")

    // ---- T4: robots gate + per-host politeness schedule (both phases) ---
    // per-host order: phase 0 (ArrivalKey order) then phase 1 (score order);
    // robots + min-delay both come from the broadcast host-profile join
    val allowed = htmlLinks
      .join(broadcast(hostProfilesDf.select($"host", $"robots_disallow")), Seq("host"), "left")
      .filter(robotsAllowedCol($"href")).drop("robots_disallow")
    val hostState = hostStateT.read(spark)
      .getOrElse(Seq.empty[(String, Long)].toDF("host", "next_free_ms"))
    val phaseA = allowed.select($"href", $"host", lit(0).as("phase"),
      $"kind", $"query_rank", $"page", $"result_rank", lit(0.0d).as("neg_score"))
    val phaseB = picks.select($"href", $"host", lit(1).as("phase"),
      lit(0).as("kind"), lit(0).as("query_rank"), lit(0).as("page"),
      lit(0).as("result_rank"), (-$"score").as("neg_score"))
    val wHost = Window.partitionBy($"host").orderBy(
      $"phase", $"kind", $"query_rank", $"page", $"result_rank", $"neg_score", $"href")
    val sched = phaseA.unionByName(phaseB)
      .join(broadcast(hostState), Seq("host"), "left")
      .na.fill(0L, Seq("next_free_ms"))
      .withColumn("slot", row_number().over(wHost) - lit(1))
      .join(broadcast(hostProfilesDf.select($"host", $"min_delay_ms")), Seq("host"), "left")
      .withColumn("scheduled_ms", $"next_free_ms" + $"slot" * $"min_delay_ms")
      .withColumn("salt", pmod(xxhash64($"href"), lit(saltShards)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- S6/G1/G2/G5: salted fetch + span extraction + link discovery ---
    val fetched: Dataset[(PageDoc, Seq[SequentialOracle.OracleImage], Seq[String])] = sched
      .select($"href", $"host", $"salt", $"scheduled_ms")
      .repartition(nPart, $"host", $"salt")
      .sortWithinPartitions($"scheduled_ms") // politeness order within shard
      .as[(String, String, Int, Long)]
      .mapPartitions { it =>
        it.flatMap { case (url, _, _, _) =>
          SyntheticWeb.fetch(webCfg, url).map { html =>
            val ex = SpanExtractor.extract(url, html)
            val doc = PageDoc(SpanExtractor.docId(url), url, ex.pageTitle,
              ex.pageSummary, ex.spans, round)
            val imgs: Seq[SequentialOracle.OracleImage] =
              ex.images.map(r => SequentialOracle.OracleImage(
                r.image_url, url, ex.pageTitle, r.alt_text, r.title_attribute,
                r.raw_caption, ex.pageSummary, round))
            val outLinks: Seq[String] =
              ex.links.collect { case (_, u) if u.startsWith("http") => u }
            (doc, imgs, outLinks)
          }
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)
    val docsDf = fetched.map(_._1)
    val imagesDf = fetched.flatMap(_._2)

    // per-partition lineage counters from the fetch stage (north rule):
    // one row per (host,salt) shard — docs, spans, images produced there
    val partMetrics = fetched.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var docs = 0L; var spans = 0L; var imgs = 0L
      it.foreach { case (d, im, _) => docs += 1; spans += d.spans.size; imgs += im.size }
      Iterator((pid, docs, spans, imgs))
    }.toDF("partition_id", "docs", "spans", "images")
      .filter($"docs" > 0)
      .withColumn("generation", lit(round))

    // materialize the shared caches EXACTLY ONCE before the concurrent
    // commit window: Spark's block cache does not coordinate concurrent
    // first-computation of the same partition, so racing consumers would
    // redundantly re-run the dedup window / fetch+extract
    newLinks.count()
    fetched.count()
    lap("compute")

    // ---- commits (processed_queries LAST — K3 barrier) -----------------
    // Independent table commits run as CONCURRENT Spark jobs (separate
    // dirs, per-table atomic pointer flips; crash recovery handles any
    // committed subset). Per-generation counters come free from the
    // manifests' per-commit row deltas — no standalone count() jobs.
    val seenDelta = newLinks.select($"href", $"host")
      .unionByName(picks.select($"href", $"host"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val seenF = Future(seenT.append(seenDelta, round))
    val linksF = Future(linksT.append(kept.toDF(), round))
    val pdfF = Future(pdfT.append(
      pdfLinks.select($"href".as("url"), lit(round).as("generation")), round))
    val eventsF = Future(eventsT.append(
      sched.select($"href".as("url"), $"host", $"salt", $"scheduled_ms",
        $"min_delay_ms", lit(round).as("round"), $"phase"), round))
    val docsF = Future(docsT.append(docsDf.toDF(), round))
    val imagesF = Future(imagesT.append(imagesDf.toDF(), round))
    val pmF = Future(partitionMetricsT.append(partMetrics, round))
    // host_state: untouched hosts keep state; scheduled hosts advance —
    // depends only on sched (persisted), so it rides the same window
    val hostF = Future {
      val updatedState = sched.groupBy($"host")
        .agg((max($"scheduled_ms") + first($"min_delay_ms")).as("next_free_ms"))
      val newState = hostState.join(updatedState, Seq("host"), "left_anti")
        .unionByName(updatedState)
      hostStateT.replace(newState, round)
    }
    // distributed Bloom delta build rides the same concurrency window
    val bloomF = Future(BlockedBloom.buildLike(seenDelta.select($"href").as[String], bloom))
    val (seenMeta, linksMeta, eventsMeta, docsMeta, pdfMeta) = (
      Await.result(seenF, Duration.Inf), Await.result(linksF, Duration.Inf),
      Await.result(eventsF, Duration.Inf), Await.result(docsF, Duration.Inf),
      Await.result(pdfF, Duration.Inf))
    Await.result(imagesF, Duration.Inf); Await.result(pmF, Duration.Inf)
    Await.result(hostF, Duration.Inf)
    bloom.merge(Await.result(bloomF, Duration.Inf))
    lap("commits")

    val nNew = seenT.deltaRows(seenMeta) - nExpanded
    val nKept = linksT.deltaRows(linksMeta)
    val nScheduled = eventsT.deltaRows(eventsMeta)
    val nDocs = docsT.deltaRows(docsMeta)
    val counters = Map(
      "candidates" -> nCandidates,
      "skipped" -> (nCandidates - nNew),
      "new" -> nNew,
      "added" -> nKept,
      "expanded" -> nExpanded,
      "scheduled" -> nScheduled,
      "robots_blocked" -> (nKept - pdfT.deltaRows(pdfMeta) + nExpanded - nScheduled),
      "docs" -> nDocs)

    // cuckoo invariant: each hot-host filter must stay a SUPERSET of that
    // host's seen URLs or its exact-negative claim breaks — insert this
    // generation's new URLs for tracked hosts (bounded: hot hosts only)
    if (cuckoos.nonEmpty) {
      seenDelta.filter($"host".isin(cuckoos.keySet.toSeq: _*))
        .select($"host", $"href").as[(String, String)].collect()
        .foreach { case (h, u) => cuckoos(h).insert(u) }
    }

    // ---- frontier maintenance: (old - picked) + new discoveries ---------
    if (expandTopK > 0) {
      val scoreOf = udf((u: String) => SyntheticWeb.linkScore(webCfg, u))
      val seenNow = seenT.read(spark).get.select($"href".as("url"))
      val discoveries = fetched.flatMap(_._3).toDF("url").distinct()
        .join(seenNow, Seq("url"), "left_anti")
        .join(oldFrontier.select($"url"), Seq("url"), "left_anti")
        .withColumn("host", regexp_extract(lower($"url"), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1))
        .withColumn("score", scoreOf($"url"))
        .withColumn("discovered_gen", lit(round))
        .select($"url", $"host", $"score", $"discovered_gen")
      val newFrontier = oldFrontier
        .join(picks.select($"href".as("url")), Seq("url"), "left_anti")
        .unionByName(discoveries)
      frontierT.replace(newFrontier, round)
    }
    lap("frontier")
    metricsT.append(counters.toSeq.toDF("key", "value").withColumn("generation", lit(round)), round)
    processedT.append(batch.zipWithIndex.toDF("query", "query_rank")
      .withColumn("generation", lit(round)), round) // commit point
    lap("metrics+barrier")

    Seq[Dataset[_]](newLinks, kept, picks, sched, fetched, seenDelta)
      .foreach(_.unpersist())
    counters
  }

  // ------------------------------------------------------- verification IO
  def seenSet(): Set[String] =
    seenT.read(spark).map(_.select($"href").as[String].collect().toSet).getOrElse(Set.empty)

  def crawlOrder(): Vector[String] =
    eventsT.read(spark).map(
      _.orderBy($"round", $"scheduled_ms", $"host", $"url")
        .select($"url").as[String].collect().toVector).getOrElse(Vector.empty)

  def docs(): Vector[PageDoc] =
    docsT.read(spark).map(_.as[PageDoc].collect().toVector).getOrElse(Vector.empty)
}
