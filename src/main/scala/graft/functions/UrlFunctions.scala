package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL scalar functions with reference-equivalent semantics.
  *
  * Each function exists twice: a pure-Scala form (used by the sequential
  * oracle and inside span extraction) and, where practical, a Catalyst
  * `Column` form built from codegen'd builtins (`regexp_replace`,
  * `regexp_extract`, ...) so the hot relational paths stay inside
  * whole-stage codegen. Parity between the two forms is property-tested
  * (UrlFunctionsSpec).
  *
  * Reference semantics (citations into /root/reference/):
  *  - canonicalise: app/core/scraper.py:56-62
  *  - resolution parse: app/core/scraper.py:64-72
  *  - srcset parse / best pick: app/core/scraper.py:216-227
  *  - urljoin: app/core/scraper.py:239,246,253 (python urljoin)
  */
object UrlFunctions {

  /** Minimal urlsplit: (scheme, netloc, path, query, fragment).
    * Matches python's urlsplit on the URL shapes the pipeline sees
    * (absolute http(s) URLs and relative refs).
    */
  final case class UrlParts(scheme: String, netloc: String, path: String, query: String, fragment: String)

  def urlsplit(url: String): UrlParts = {
    var rest = url
    var fragment = ""
    val fi = rest.indexOf('#')
    if (fi >= 0) { fragment = rest.substring(fi + 1); rest = rest.substring(0, fi) }
    var scheme = ""
    val si = rest.indexOf(':')
    if (si > 0 && rest.substring(0, si).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
        rest.substring(0, si).headOption.exists(_.isLetter)) {
      scheme = rest.substring(0, si); rest = rest.substring(si + 1)
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      val end0 = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
      val end = if (end0 < 0) rest.length else end0
      netloc = rest.substring(2, end); rest = rest.substring(end)
    }
    var query = ""
    val qi = rest.indexOf('?')
    var path = rest
    if (qi >= 0) { query = rest.substring(qi + 1); path = rest.substring(0, qi) }
    UrlParts(scheme, netloc, path, query, fragment)
  }

  private def urlunsplit(p: UrlParts): String = {
    val sb = new StringBuilder
    if (p.scheme.nonEmpty) { sb.append(p.scheme).append(':') }
    if (p.netloc.nonEmpty || p.scheme.nonEmpty) sb.append("//").append(p.netloc)
    sb.append(p.path)
    if (p.query.nonEmpty) sb.append('?').append(p.query)
    if (p.fragment.nonEmpty) sb.append('#').append(p.fragment)
    sb.toString
  }

  /** Host of a URL, lowered; empty string when absent. */
  def hostOf(url: String): String = urlsplit(url).netloc.toLowerCase

  // regex literals shared by scala + column forms (scraper.py:59-61);
  // the scala forms run once PER IMAGE in the extraction hot loop, so every
  // pattern is compiled once here — String.replaceAll / fresh .r would
  // re-compile per call (measured: a visible share of the 190 us/page
  // extraction cost)
  private val CanonPathSeg = "/\\d{2,4}/\\d{2,4}/"
  private val CanonResSuffix = "-\\d{2,4}x\\d{2,4}(?=\\.\\w+$)"
  private val CanonQueryParam = "(?i)(\\?|&)(w|width|h|height|size)=\\d+"
  private val CanonPathSegP = java.util.regex.Pattern.compile(CanonPathSeg)
  private val CanonResSuffixP = java.util.regex.Pattern.compile(CanonResSuffix)
  private val CanonQueryParamP = java.util.regex.Pattern.compile(CanonQueryParam)
  private val ResPathRe = "/(\\d{2,4})/(\\d{2,4})/".r
  private val ResSuffixRe = "-([1-9]\\d{2,4})x([1-9]\\d{2,4})(?=\\.\\w+$)".r
  private val DescriptorRe = "^(\\d+)(w|x)".r

  /** Image-URL canonicalisation, scraper.py:56-62:
    * strip /WxH/ path segments, -WxH suffix before extension, w/h/size
    * query params; lower scheme+netloc; strip trailing '/' from path; drop
    * fragment.
    */
  def canonicaliseUrl(url: String): String = {
    val p = urlsplit(url)
    val path0 = CanonPathSegP.matcher(p.path).replaceAll("/")
    val path = CanonResSuffixP.matcher(path0).replaceAll("")
    val query = CanonQueryParamP.matcher(p.query).replaceAll("")
    urlunsplit(UrlParts(p.scheme.toLowerCase, p.netloc.toLowerCase,
      path.reverse.dropWhile(_ == '/').reverse, query, ""))
  }

  /** Column form of [[canonicaliseUrl]] for relational dedup (D4). Assumes
    * absolute http(s) URLs without fragments — the shape image URLs have
    * after resolution — and is parity-tested against the Scala form.
    */
  def canonicaliseUrlCol(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    // scheme://netloc lowered, rest untouched: split at first '/' after "://"
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    val netloc = lower(regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val pathq = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path = regexp_extract(pathq, "^([^?]*)", 1)
    val query = when(pathq.contains("?"), regexp_extract(pathq, "\\?(.*)$", 1)).otherwise(lit(""))
    val path1 = regexp_replace(regexp_replace(path, CanonPathSeg, "/"), CanonResSuffix, "")
    val path2 = regexp_replace(path1, "/+$", "")
    val query1 = regexp_replace(query, CanonQueryParam, "")
    concat(scheme, lit("://"), netloc, path2,
      when(query1 =!= "", concat(lit("?"), query1)).otherwise(lit("")))
  }

  /** (w,h) parsed from URL, scraper.py:64-72; (0,0) when absent. */
  def parseResolution(url: String): (Int, Int) = {
    val m1 = ResPathRe.findFirstMatchIn(url)
    m1 match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None =>
        val m2 = ResSuffixRe.findFirstMatchIn(url)
        m2 match {
          case Some(m) => (m.group(1).toInt, m.group(2).toInt)
          case None => (0, 0)
        }
    }
  }

  /** Column form: pixel area w*h (LongType) used for the best-image argmax. */
  def resolutionAreaCol(c: Column): Column = {
    val w1 = regexp_extract(c, "/(\\d{2,4})/(\\d{2,4})/", 1)
    val h1 = regexp_extract(c, "/(\\d{2,4})/(\\d{2,4})/", 2)
    val w2 = regexp_extract(c, "-([1-9]\\d{2,4})x([1-9]\\d{2,4})(?=\\.\\w+$)", 1)
    val h2 = regexp_extract(c, "-([1-9]\\d{2,4})x([1-9]\\d{2,4})(?=\\.\\w+$)", 2)
    when(w1 =!= "", w1.cast("long") * h1.cast("long"))
      .when(w2 =!= "", w2.cast("long") * h2.cast("long"))
      .otherwise(lit(0L))
  }

  /** srcset parse, scraper.py:216-217: entries split on ',', each entry
    * "url descriptor" (split on first space run) or bare url → descriptor "1x".
    */
  def parseSrcset(srcset: String): Seq[(String, String)] =
    srcset.split(",").toSeq.map { entry0 =>
      val entry = entry0
      if (entry.contains(" ")) {
        val parts = entry.split(" ").map(_.trim)
        // python: tuple(map(str.strip, entry.split(" "))) — two-field shape
        (parts.headOption.getOrElse("").trim, parts.lift(1).getOrElse("").trim)
      } else (entry.trim, "1x")
    }

  /** descriptor score, scraper.py:223-227: leading int of `(\d+)(w|x)` else 1. */
  def descriptorScore(d: String): Int = {
    val m = DescriptorRe.findFirstMatchIn(d)
    m.map(_.group(1).toInt).getOrElse(1)
  }

  /** best srcset candidate, scraper.py:219-227 — python `max` keeps the
    * FIRST maximal element, preserved here.
    */
  def pickBest(candidates: Seq[(String, String)]): Option[String] =
    if (candidates.isEmpty) None
    else Some(candidates.maxBy(c => descriptorScore(c._2))._1)

  /** RFC-3986 relative resolution matching python's urljoin for the shapes
    * in play (absolute base; ref absolute, scheme-relative, root-relative,
    * or relative path).
    */
  def urljoin(base: String, ref: String): String = {
    if (ref.isEmpty) return base
    val r = urlsplit(ref)
    if (r.scheme.nonEmpty) return normalizeJoined(r)
    val b = urlsplit(base)
    if (ref.startsWith("//")) return normalizeJoined(UrlParts(b.scheme, r.netloc, r.path, r.query, r.fragment))
    if (r.path.startsWith("/")) return normalizeJoined(UrlParts(b.scheme, b.netloc, r.path, r.query, r.fragment))
    if (r.path.isEmpty) {
      val q = if (r.query.nonEmpty) r.query else b.query
      return normalizeJoined(UrlParts(b.scheme, b.netloc, b.path, q, r.fragment))
    }
    val baseDir = b.path.substring(0, b.path.lastIndexOf('/') + 1)
    normalizeJoined(UrlParts(b.scheme, b.netloc, mergeDots(baseDir + r.path), r.query, r.fragment))
  }

  private def normalizeJoined(p: UrlParts): String = urlunsplit(p.copy(path = mergeDots(p.path)))

  private def mergeDots(path: String): String = {
    if (path.isEmpty) return path
    val segs = path.split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    segs.foreach {
      case "." => ()
      case ".." => if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1) else ()
      case s => out += s
    }
    val joined = out.mkString("/")
    if ((path.endsWith("/.") || path.endsWith("/..")) && !joined.endsWith("/")) joined + "/" else joined
  }
}
