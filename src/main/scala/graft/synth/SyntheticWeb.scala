package graft.synth

import graft.model._
import graft.util.Hashing._

/** Deterministic synthetic web universe shared by the sequential oracle and
  * the Spark engine (FIXTURES.md §1-5). Everything is a pure function of
  * (cfg.seed, entity ids): host profiles, page HTML, the search API, the
  * fetch function, PDF content types. No network, no wall clock, no mutable
  * RNG — so any evaluation order (single-threaded oracle, arbitrary Spark
  * task order) observes the same web.
  *
  * Host frontier mass is Zipf(α≈1) (power-law per BASELINE.json metric):
  * a uniform draw u maps to host rank ⌊H^u⌋, giving P(rank≤r) = log_H r,
  * i.e. density ∝ 1/rank.
  */
final case class WebConfig(
    seed: Long = 42L,
    nHosts: Int = 1000,
    resultsPerPage: Int = 10,
    pages: Int = 1, // config.yaml:22 ships pages=1 (pageno bug invisible)
    fetchFailRate: Double = 0.04,
    relevantRate: Double = 0.75,
    bodyElems: Int = 12) // max body elements per page (bench raises this)

object SyntheticWeb {

  private val Vocab: Array[String] = Array(
    "merlion", "marina", "orchard", "sentosa", "hawker", "laksa", "kopi",
    "jurong", "changi", "raffles", "bugis", "clementi", "tampines", "harbour",
    "garden", "museum", "festival", "heritage", "transit", "skyline", "island",
    "market", "temple", "bridge", "library", "science", "history", "culture",
    "economy", "policy", "nature", "wildlife", "coast", "river", "tower")

  private val Engines = Array("duckduckgo", "bing", "brave", "google", "mojeek")

  def words(h: Long, n: Int): String =
    (0 until n).map(i => Vocab(bounded(fmix64(h + i * 0x9e3779b97f4a7c15L), Vocab.length))).mkString(" ")

  // ------------------------------------------------------------------ hosts
  def hostName(cfg: WebConfig, rank: Int): String = s"host$rank.example"

  def hostRankOf(host: String): Int =
    host.stripPrefix("host").stripSuffix(".example").toInt

  /** Zipf(1) draw: uniform u → rank ⌊H^u⌋ in [1, H]. Rank 1 is the hottest. */
  def zipfHostRank(cfg: WebConfig, h: Long): Int = {
    val u = toUnit(h)
    math.min(cfg.nHosts, math.max(1, math.pow(cfg.nHosts.toDouble, u).toInt))
  }

  /** Page-id space per host grows with host mass so hot hosts both receive
    * more traffic and have more distinct pages; collisions (the dedup load)
    * occur naturally on every host.
    */
  def pageCount(cfg: WebConfig, rank: Int): Long =
    math.max(4L, (4096.0 / rank).toLong)

  def minDelayMs(cfg: WebConfig, rank: Int): Long =
    50L * (1 + bounded(det(cfg.seed, "delay", rank), 6)) // 50..300ms

  def robotsDisallow(cfg: WebConfig, rank: Int): Seq[String] =
    if (bounded(det(cfg.seed, "robots", rank), 100) < 30) Seq("/private/") else Seq.empty

  def hostProfile(cfg: WebConfig, rank: Int): HostProfile =
    HostProfile(hostName(cfg, rank), rank.toLong, minDelayMs(cfg, rank),
      robotsDisallow(cfg, rank), pageCount(cfg, rank))

  def allHosts(cfg: WebConfig): Seq[HostProfile] =
    (1 to cfg.nHosts).map(hostProfile(cfg, _))

  /** robots evaluation: true when the path is allowed for this host. */
  def robotsAllows(cfg: WebConfig, url: String): Boolean = {
    val p = graft.functions.UrlFunctions.urlsplit(url)
    if (p.netloc.isEmpty) true
    else {
      val rank = try hostRankOf(p.netloc) catch { case _: Throwable => return true }
      !robotsDisallow(cfg, rank).exists(p.path.startsWith)
    }
  }

  // ------------------------------------------------------------------ URLs
  /** Deterministic page URL for (host rank, page id). A slice of pages are
    * PDFs, a slice are "download" traps (PDF-likely by heuristic, actually
    * HTML), a slice live under the robots-disallowed /private/ prefix.
    */
  def pageUrl(cfg: WebConfig, rank: Int, pid: Long): String = {
    val host = hostName(cfg, rank)
    val cls = bounded(det(cfg.seed, "ucls", rank, pid), 100)
    if (cls < 6) s"https://$host/files/doc$pid.pdf"
    else if (cls < 10) s"https://$host/download/item$pid"
    else if (cls < 14) s"https://$host/private/page$pid.html"
    else s"https://$host/wiki/page$pid.html"
  }

  /** Content-type oracle for the PDF confirm probe (scraper.py:100-124):
    * real .pdf paths confirm ~90% of the time, trap paths ~10%.
    */
  def confirmsPdf(cfg: WebConfig, url: String): Boolean = confirmsPdf(cfg.seed, url)

  /** Seed-only kernel shared with the codegen'd `confirms_pdf` expression. */
  def confirmsPdf(seed: Long, url: String): Boolean = {
    val h = det(seed, "ctype", url)
    if (url.endsWith(".pdf")) bounded(h, 100) < 90
    else bounded(h, 100) < 10
  }

  // ----------------------------------------------------------------- search
  /** Pure search function: (query, page, isImage) → SearXNG-shaped hits
    * (crawler.py:100-107). Deterministic in all arguments.
    */
  def searchHits(cfg: WebConfig, query: String, page: Int, isImage: Boolean): Seq[SearchHit] = {
    if (query == null || query.trim.isEmpty) return Seq.empty // crawler.py:65-67
    val kind = if (isImage) 1 else 0
    (0 until cfg.resultsPerPage).map { i =>
      val h = det(cfg.seed, "hit", query.trim, page, kind, i)
      val rank = zipfHostRank(cfg, det(h, "host"))
      val pid = boundedLong(det(h, "pid"), pageCount(cfg, rank))
      val url = pageUrl(cfg, rank, pid)
      val relevant = toUnit(det(h, "rel")) < cfg.relevantRate
      val sgTitle = if (relevant) "singapore " else ""
      val sgBody = if (relevant && toUnit(det(h, "rel2")) < 0.7) " singapore" else ""
      val title = sgTitle + words(det(h, "t"), 3 + bounded(det(h, "tn"), 4))
      val content = words(det(h, "c"), 8 + bounded(det(h, "cn"), 10)) + sgBody
      val engine = Engines(bounded(det(h, "e"), Engines.length))
      if (isImage) {
        val img = imageUrl(cfg, rank, det(h, "img"), forcedValid = true)
        SearchHit(url, title, content, engine, Some(img), Some(img + "?size=160"))
      } else SearchHit(url, title, content, engine, None, None)
    }
  }

  // ----------------------------------------------------------------- images
  /** Image URL universe. Mix of: plain valid (extension), path-only valid,
    * resolution-tagged variants of a shared canonical base (exercising D4
    * canonical dedup + argmax), invalid ad-domain / placeholder / svg URLs,
    * and relative refs (exercising urljoin).
    */
  def imageUrl(cfg: WebConfig, rank: Int, h: Long, forcedValid: Boolean = false): String = {
    val host = hostName(cfg, rank)
    val id = bounded(det(h, "iid"), 500)
    val cls = if (forcedValid) bounded(det(h, "icls"), 50) else bounded(det(h, "icls"), 100)
    val res = Seq((320, 200), (640, 400), (1280, 800))(bounded(det(h, "res"), 3))
    if (cls < 25) s"https://$host/images/img$id-${res._1}x${res._2}.jpg"
    else if (cls < 40) s"https://cdn$rank.example/media/photo$id.png"
    else if (cls < 50) s"https://$host/${res._1}/${res._2}/upload/pic$id"
    else if (cls < 60) s"/images/img$id-${res._1}x${res._2}.jpg" // relative
    else if (cls < 75) s"https://$host/assets/style$id.svg" // bad ext, no good path
    else if (cls < 88) s"https://$host/images/placeholder$id.foo" // good path, bad word
    else s"https://x.doubleclick.net/img/banner$id.jpg" // ad domain
  }

  // ------------------------------------------------------------------ pages
  /** Fetch function (S6 stand-in): url → Some(html) or None (~fetchFailRate,
    * mirroring scraper.py:144-209 "any failure → None").
    */
  def fetch(cfg: WebConfig, url: String): Option[String] =
    if (toUnit(det(cfg.seed, "fail", url)) < cfg.fetchFailRate) None
    else Some(pageHtml(cfg, url))

  /** Deterministic page HTML for a URL, one element per line, drawn from the
    * constrained subset SpanExtractor parses. Pages deliberately contain
    * elements the extractor must FILTER (short paragraphs, invalid image
    * URLs, canonical-duplicate images at different resolutions) so the
    * extraction semantics are non-trivially exercised.
    *
    * Constraint relied on by the markdown renderer: no two adjacent lists.
    */
  def pageHtml(cfg: WebConfig, url: String): String = {
    val h0 = det(cfg.seed, "page", url)
    val rank = try hostRankOf(graft.functions.UrlFunctions.hostOf(url)) catch { case _: Throwable => 1 }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val title = words(det(h0, "title"), 4)
    out += s"<title>$title</title>"
    if (toUnit(det(h0, "hasmeta")) < 0.7)
      out += s"""<meta name="description" content="${words(det(h0, "meta"), 8)}">"""
    val nBody = 4 + bounded(det(h0, "nbody"), math.max(1, cfg.bodyElems - 3))
    var lastWasList = false
    var i = 0
    while (i < nBody) {
      val eh = det(h0, "el", i)
      val kind = bounded(eh, 10)
      val emitted: Option[String] = kind match {
        case 0 =>
          val lvl = 1 + bounded(det(eh, "lvl"), 4)
          Some(s"<h$lvl>${words(det(eh, "w"), 3)}</h$lvl>")
        case 1 | 2 | 3 =>
          Some(s"<p>${words(det(eh, "w"), 6 + bounded(det(eh, "n"), 20))}</p>")
        case 4 =>
          Some(s"<p>${words(det(eh, "w"), 1 + bounded(det(eh, "n"), 2))}</p>") // short, filtered
        case 5 if !lastWasList =>
          val tag = if (bounded(det(eh, "ol"), 2) == 0) "ul" else "ol"
          val items = (0 until (2 + bounded(det(eh, "ni"), 3)))
            .map(j => s"<li>${words(det(eh, "li", j), 3)}</li>").mkString
          Some(s"<$tag>$items</$tag>")
        case 6 =>
          Some(s"<blockquote>${words(det(eh, "w"), 5)}</blockquote>")
        case 7 | 8 =>
          val img = imageUrl(cfg, rank, det(eh, "img"))
          val alt = words(det(eh, "alt"), 2)
          val srcset =
            if (toUnit(det(eh, "hasss")) < 0.25) {
              val img2 = imageUrl(cfg, rank, det(eh, "img2"), forcedValid = true)
              s""" srcset="$img 640w, $img2 1280w""""
            } else ""
          if (toUnit(det(eh, "fig")) < 0.3)
            Some(s"""<figure><img src="$img" alt="$alt"$srcset><figcaption>${words(det(eh, "cap"), 4)} photo</figcaption></figure>""")
          else
            Some(s"""<img src="$img" alt="$alt"$srcset>""")
        case _ =>
          val rank2 = zipfHostRank(cfg, det(eh, "lh"))
          val pid2 = boundedLong(det(eh, "lp"), pageCount(cfg, rank2))
          Some(s"""<a href="${pageUrl(cfg, rank2, pid2)}">${words(det(eh, "lw"), 2)}</a>""")
      }
      emitted.foreach { line => out += line; lastWasList = line.startsWith("<ul>") || line.startsWith("<ol>") }
      i += 1
    }
    out.mkString("\n")
  }

  def docId(url: String): String = f"${murmur3_64(url, 0L)}%016x"

  /** Deterministic frontier priority score in [0,1) for a discovered link —
    * the stand-in for PageRank-ish signals; pure function of the URL so the
    * oracle and the engine agree without coordination.
    */
  def linkScore(cfg: WebConfig, url: String): Double = linkScore(cfg.seed, url)

  /** Seed-only kernel shared with the codegen'd `link_score` expression. */
  def linkScore(seed: Long, url: String): Double = toUnit(det(seed, "score", url))
}
