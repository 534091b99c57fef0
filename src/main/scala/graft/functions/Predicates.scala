package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filter predicates with reference-equivalent semantics, in both pure-Scala
  * (oracle / extraction) and Catalyst Column form (engine hot paths).
  * Parity between the forms is property-tested.
  */
object Predicates {

  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  private val PdfCgi = "\\b(viewcontent|article)\\.cgi\\?".r
  private val PdfWords = "\\b(attachment|download|file|document)\\b".r

  /** whitespace-normalize + lower (helper_classes.py:13-16). */
  def normalizeText(s: String): String =
    WsRun.matcher(s.trim.toLowerCase).replaceAll(" ")

  def normalizeTextCol(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  // -------------------------------------------------------- PDF heuristic
  /** PDF-likelihood heuristic (scraper.py:75-97):
    * lowercase the URL, then:
    *   1. path endswith .pdf
    *   2. "pdf" in path or query
    *   3. \b(viewcontent|article)\.cgi\? in path  [note: '?' never occurs in
    *      a split path, so case 3 is dead in the reference too — preserved]
    *   4. \b(attachment|download|file|document)\b in path
    */
  def isLikelyPdfUrl(url: String): Boolean = {
    val p = UrlFunctions.urlsplit(url.toLowerCase)
    p.path.endsWith(".pdf") ||
    p.path.contains("pdf") || p.query.contains("pdf") ||
    PdfCgi.findFirstIn(p.path).isDefined ||
    PdfWords.findFirstIn(p.path).isDefined
  }

  /** Column form over (path, query) columns extracted from a URL column. */
  def isLikelyPdfUrlCol(url: Column): Column = {
    val u = lower(url)
    val path = regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = when(u.contains("?"), regexp_extract(u, "\\?([^#]*)", 1)).otherwise(lit(""))
    path.endsWith(".pdf") ||
      path.contains("pdf") || query.contains("pdf") ||
      path.rlike("\\b(viewcontent|article)\\.cgi\\?") ||
      path.rlike("\\b(attachment|download|file|document)\\b")
  }

  // ------------------------------------------------------ image validator
  // helper_classes.py:184-222
  private val AdDomain = ("\\.(doubleclick\\.net|googlesyndication\\.com|adservice\\.google\\.com|" +
    "adnetwork\\.com|adnxs\\.com|yieldmanager\\.com|pubmatic\\.com|rubiconproject\\.com|" +
    "applovin\\.com|taboola\\.com|outbrain\\.com|smartadserver\\.com|zedo\\.com|" +
    "pulse3d\\.com|casalemedia\\.com|lijit\\.com|analytics\\.google\\.com|" +
    "connect\\.facebook\\.net|ads\\.pinterest\\.com|analytics\\.twitter\\.com|" +
    "bat\\.bing\\.com|cdn\\.adsafeprotected\\.com|scorecardresearch\\.com|" +
    "quantserve\\.com|moatads\\.com)$").r
  private val GoodPath = "\\b(image|img|photo|picture|media|upload|content|wp-content)\\b".r
  private val BadPath = ("\\b(placeholder|spinner|tracking|pixel|blank|spacer|clear\\.gif|" +
    "transparent\\.png|loading|1x1\\.|\\.svg$|data:image/svg)\\b").r
  private val GoodExt = Set(".jpg", ".jpeg", ".png", ".webp", ".bmp", ".tiff", ".gif")

  /** Image-URL validity (helper_classes.py:208-222): reject ad domains;
    * accept good extensions; else accept good-path unless bad-path.
    */
  def isValidImageUrl(url: String): Boolean = {
    if (url == null || url.isEmpty) return false
    val p = UrlFunctions.urlsplit(url)
    val domain = p.netloc.toLowerCase
    val path = p.path.toLowerCase
    if (AdDomain.findFirstIn(domain).isDefined) return false
    val basePath = path.split("\\?", 2)(0)
    if (GoodExt.exists(basePath.endsWith)) return true
    GoodPath.findFirstIn(basePath).isDefined && BadPath.findFirstIn(basePath).isEmpty
  }

  def isValidImageUrlCol(url: Column): Column = {
    val domain = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val path = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    val adDomain = domain.rlike(AdDomain.regex)
    val goodExt = GoodExt.map(e => path.endsWith(e)).reduce(_ || _)
    val goodPath = path.rlike(GoodPath.regex)
    val badPath = path.rlike(BadPath.regex)
    url.isNotNull && (url =!= "") && !adDomain && (goodExt || (goodPath && !badPath))
  }

  // --------------------------------------------------- relevance predicate
  /** Deterministic replacement for the reference's LLM majority-vote
    * relevance filter (helper_classes.py:225-262). The engine cannot call an
    * LLM; the dead-code heuristic the reference itself shipped for the same
    * purpose (app/utils/utils.py:13-25, word-boundary match over Singapore
    * variants) is the natural deterministic stand-in. Votes over
    * (title, url, snippet) like the prompt at helper_classes.py:239: keep
    * when ≥2 of the three fields mention a relevance keyword — mirroring the
    * 2-of-3 yes-vote rule at helper_classes.py:258-262.
    */
  private val RelevanceVariants = Seq("singapore", "spore", "sgp", "sg")
  private val RelevanceRegex = ("\\b(" + RelevanceVariants.mkString("|") + ")\\b").r

  def fieldMentionsRelevant(s: String): Boolean =
    RelevanceRegex.findFirstIn(normalizeText(if (s == null) "" else s)).isDefined

  /** 2-of-3 majority over title/url/snippet (content truncated to 5000 chars
    * before voting, helper_classes.py:238).
    */
  def isRelevant(title: String, href: String, content: String): Boolean = {
    val snippet = (if (content == null) "" else content).take(5000)
    val votes = Seq(title, href, snippet).count(fieldMentionsRelevant)
    votes > 1
  }

  def isRelevantCol(title: Column, href: Column, content: Column): Column = {
    def vote(c: Column): Column =
      when(lower(regexp_replace(trim(coalesce(c, lit(""))), "\\s+", " "))
        .rlike(RelevanceRegex.regex), 1).otherwise(0)
    (vote(title) + vote(href) + vote(substring(coalesce(content, lit("")), 1, 5000))) > 1
  }
}
