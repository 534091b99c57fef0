package graft.oracle

import graft.model._
import graft.synth.{SyntheticWeb, WebConfig}
import graft.functions.{Predicates, SpanExtractor, UrlFunctions}
import graft.util.Hashing._

import scala.collection.mutable

/** Sequential oracle — the executable spec of the reference pipeline
  * (app/main.py:54-104 batch loop, app/core/crawler.py:152-237 search+dedup,
  * app/core/scraper.py:321-383 filter+fetch+extract) run single-threaded
  * over the synthetic web, extended with the north rule's politeness/robots
  * semantics exactly as the engine defines them. The Spark engine must
  * reproduce this oracle's outputs bit-for-bit: crawl order, final URL-seen
  * set, per-document span sequences, per-host fetch schedule.
  *
  * Determinism normalizations vs the reference (SURVEY §2.7/§4.3):
  *  - the unseeded `random.shuffle` (main.py:61) becomes a seeded hash-rank
  *    shuffle shared with the engine;
  *  - thread-arrival order (crawler.py:269) becomes ArrivalKey order
  *    (round, kind, queryRank, page, resultRank);
  *  - the LLM relevance filter becomes the deterministic 2-of-3 keyword
  *    vote (Predicates.isRelevant);
  *  - wall-clock timestamps become the virtual politeness clock.
  * Reference quirks preserved: general-search pageno bug (crawler.py:80 —
  * every general page-loop iteration requests page `cfg.pages`; image search
  * paginates correctly, crawler.py:124); first-seen-wins dedup BEFORE the
  * relevance filter (so filtered-out URLs still enter the seen set,
  * crawler.py:184-206); pdf-vs-html split by confirmed PDFs only
  * (scraper.py:334); python-max first-maximal tie-break in image dedup.
  */
object SequentialOracle {

  /** Image-metadata record shape (scraper.py:258-267). */
  final case class OracleImage(
      image_url: String, page_url: String, page_title: String,
      alt_text: String, title_attribute: String, raw_caption: String,
      page_summary: String, generation: Int)

  final case class OracleResult(
      crawlOrder: Vector[String], // fetch-attempted URLs in schedule order
      seen: Set[String],
      docs: Vector[PageDoc],
      images: Vector[OracleImage],
      pdfUrls: Vector[String],
      fetchEvents: Vector[FetchEvent],
      links: Vector[Link],
      counters: Map[String, Long],
      processedQueries: Vector[String])

  /** Seeded deterministic shuffle shared with the engine: order by
    * murmur3(query, seed ^ round). Replaces main.py:61.
    */
  def shuffleRank(seed: Long, round: Int, query: String): Long =
    murmur3_64(query, seed ^ (round.toLong * 0x9e3779b97f4a7c15L))

  def run(cfg: WebConfig, seedQueries: Seq[String], batchSize: Int,
          maxRounds: Int = Int.MaxValue,
          alreadyProcessed: Set[String] = Set.empty,
          initialSeen: Set[String] = Set.empty,
          initialNextFree: Map[String, Long] = Map.empty,
          expandTopK: Int = 0): OracleResult = {

    // S1/S2/P1/D2: seed load, blank filter, tracker anti-join (order kept)
    var remaining: Vector[String] =
      seedQueries.iterator.map(_.trim).filter(_.nonEmpty)
        .filterNot(alreadyProcessed).toVector

    val seen = mutable.LinkedHashSet.empty[String] ++ initialSeen
    val nextFree = mutable.Map.empty[String, Long] ++ initialNextFree
    // priority frontier (north-rule addition): url -> (host, score)
    val frontier = mutable.LinkedHashMap.empty[String, (String, Double)]
    val crawlOrder = Vector.newBuilder[String]
    val docs = Vector.newBuilder[PageDoc]
    val images = Vector.newBuilder[OracleImage]
    val pdfs = Vector.newBuilder[String]
    val events = Vector.newBuilder[FetchEvent]
    val allLinks = Vector.newBuilder[Link]
    val processed = Vector.newBuilder[String]
    var added = 0L; var skipped = 0L; var fetched = 0L; var robotsBlocked = 0L
    var expanded = 0L

    var round = 0
    while (remaining.nonEmpty && round < maxRounds) {
      round += 1
      // O2/O3: seeded shuffle + batch take (main.py:61-65)
      val shuffled = remaining.sortBy(q => (shuffleRank(cfg.seed, round, q), q))
      val batch = shuffled.take(batchSize)
      remaining = shuffled.drop(batchSize)

      // ---- search phase: general then image (main.py:71-75) ----
      val batchLinks = Vector.newBuilder[Link]
      for (kind <- 0 to 1; (query, qRank) <- batch.zipWithIndex) {
        val isImage = kind == 1
        for (page <- 1 to cfg.pages) {
          // crawler.py:80 pageno bug: general search always requests
          // page=cfg.pages; image search paginates (crawler.py:124)
          val effPage = if (isImage) page else cfg.pages
          val hits = SyntheticWeb.searchHits(cfg, query, effPage, isImage)
          val candidates = hits.zipWithIndex.flatMap { case (hit, rRank) =>
            if (hit.url == null || hit.url.isEmpty) None // P3
            else if (seen.contains(hit.url)) { skipped += 1; None } // D1
            else {
              seen += hit.url
              Some(Link(hit.title, hit.url, hit.content, query, effPage,
                hit.engine, if (isImage) Some("image") else None,
                hit.img_src, hit.thumbnail_src,
                round, qRank, kind, rRank, UrlFunctions.hostOf(hit.url)))
            }
          }
          // P4 relevance filter on candidates (crawler.py:209-218)
          val kept = candidates.filter(l => Predicates.isRelevant(l.title, l.href, l.content))
          added += kept.size
          batchLinks ++= kept
        }
      }
      val runLinks = batchLinks.result()
      allLinks ++= runLinks

      // ---- scrape phase (scraper.py:321-383) ----
      // scraper re-filters the run file (scraper.py:329) — idempotent here
      val sgUrls = runLinks.filter(l => Predicates.isRelevant(l.title, l.href, l.content)).map(_.href)
      // P5+S7: likely → confirmed PDFs (in order); D3 split
      val likely = sgUrls.filter(Predicates.isLikelyPdfUrl)
      val confirmed = likely.filter(u => SyntheticWeb.confirmsPdf(cfg, u))
      val confirmedSet = confirmed.toSet
      pdfs ++= confirmed
      val htmlUrls = sgUrls.filterNot(confirmedSet)

      // ---- phase B selection: priority-frontier expansion (north rule) ----
      // per host: not-yet-seen, robots-allowed frontier links, top-K by
      // (score desc, url). Picks enter the seen set at pick time.
      val picks: Seq[(String, String)] = if (expandTopK <= 0) Seq.empty else {
        frontier.iterator
          .filterNot { case (u, _) => seen.contains(u) }
          .filter { case (u, _) => SyntheticWeb.robotsAllows(cfg, u) }
          .toSeq.groupBy(_._2._1).toSeq.sortBy(_._1)
          .flatMap { case (host, entries) =>
            entries.sortBy { case (u, (_, score)) => (-score, u) }
              .take(expandTopK).map { case (u, (h, _)) => (u, h) }
          }
      }
      picks.foreach { case (u, _) => seen += u; frontier.remove(u) }
      expanded += picks.size

      // ---- politeness schedule (north-rule; engine-defined semantics) ----
      // robots gate, then per-host slots: j-th URL of host h this round is
      // scheduled at nextFree(h) + j*minDelay(h); per-host arrival order =
      // phase A (run-file / ArrivalKey order) then phase B (score order).
      val allowed = htmlUrls.filter { u =>
        val ok = SyntheticWeb.robotsAllows(cfg, u)
        if (!ok) robotsBlocked += 1
        ok
      }
      val toSchedule: Seq[(String, Int)] =
        allowed.map(u => (u, 0)) ++ picks.map { case (u, _) => (u, 1) }
      val slotIdx = mutable.Map.empty[String, Long]
      val scheduled = toSchedule.map { case (u, phase) =>
        val host = UrlFunctions.hostOf(u)
        val rank = SyntheticWeb.hostRankOf(host)
        val delay = SyntheticWeb.minDelayMs(cfg, rank)
        val j = slotIdx.getOrElse(host, 0L)
        slotIdx.update(host, j + 1)
        val t = nextFree.getOrElse(host, 0L) + j * delay
        FetchEvent(u, host, 0, t, delay, round, phase)
      }
      scheduled.groupBy(_.host).foreach { case (host, evs) =>
        val rank = SyntheticWeb.hostRankOf(host)
        val delay = SyntheticWeb.minDelayMs(cfg, rank)
        nextFree.update(host, evs.map(_.scheduled_ms).max + delay)
      }
      // canonical crawl order: by (scheduled time, host, url)
      val ordered = scheduled.sortBy(e => (e.scheduled_ms, e.host, e.url))
      events ++= ordered
      crawlOrder ++= ordered.map(_.url)

      // ---- fetch + span extraction (S6 + G1/G2/G5) + link discovery ----
      ordered.foreach { ev =>
        SyntheticWeb.fetch(cfg, ev.url) match {
          case None => () // scraper.py:293-294: fetch failure → no outputs
          case Some(html) =>
            fetched += 1
            val ex = SpanExtractor.extract(ev.url, html)
            docs += PageDoc(SpanExtractor.docId(ev.url), ev.url, ex.pageTitle,
              ex.pageSummary, ex.spans, round)
            images ++= ex.images.map(r => OracleImage(r.image_url, ev.url,
              ex.pageTitle, r.alt_text, r.title_attribute, r.raw_caption,
              ex.pageSummary, round))
            if (expandTopK > 0) ex.links.foreach { case (_, u) =>
              if (u.startsWith("http") && !seen.contains(u) && !frontier.contains(u))
                frontier.update(u, (UrlFunctions.hostOf(u), SyntheticWeb.linkScore(cfg, u)))
            }
        }
      }

      // K3 checkpoint barrier: tracker append after batch outputs
      processed ++= batch
    }

    OracleResult(crawlOrder.result(), seen.toSet, docs.result(), images.result(), pdfs.result(),
      events.result(), allLinks.result(),
      Map("added" -> added, "skipped" -> skipped, "fetched" -> fetched,
        "robots_blocked" -> robotsBlocked, "expanded" -> expanded),
      processed.result())
  }
}
