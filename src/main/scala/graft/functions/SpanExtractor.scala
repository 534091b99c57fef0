package graft.functions

import graft.model.{Span, SpanKind}
import graft.util.Hashing

/** Ordered, interleaved page extraction producing the input_hint span
  * sequence. Re-expresses the reference's single-pass DOM extraction
  * (app/utils/helper_classes.py:84-179 for text,
  * app/core/scraper.py:213-319 for images) over the constrained one-element-
  * per-line HTML subset emitted by the synthetic web generator.
  *
  * Semantics preserved from the reference:
  *  - document order = element order; the markdown string is the ordered
  *    parts list joined with "\n" (helper_classes.py:176-177)
  *  - title → "# {t}\n", meta description → "*{c}*\n"
  *    (helper_classes.py:116-124)
  *  - h1..h6 → "#"*level + " " + text (helper_classes.py:132-142)
  *  - <p> kept only when len(text) > 20 (helper_classes.py:146)
  *  - list items "- {t}" / "1. {t}" with an empty markdown line after each
  *    list (helper_classes.py:151-169)
  *  - blockquote → "> {t}" (helper_classes.py:171-173)
  *  - page summary = meta description else first <p> len > 50
  *    (helper_classes.py:19-36)
  *  - image URL resolution: srcset best-candidate by (\d+)(w|x) descriptor
  *    (first maximal wins) else src, resolved against the page URL, then
  *    validated (scraper.py:216-255, helper_classes.py:208-222)
  *  - per-page canonical image dedup keeping max w*h, first-maximal
  *    tie-break (scraper.py:302-317)
  *  - image raw_caption = surrounding text: nearest prev text > 10 chars,
  *    figcaption, caption-keyword sibling (next ≤3), nearest next text > 10
  *    chars; joined, whitespace-collapsed, truncated at 1000 chars with "…"
  *    (helper_classes.py:38-82)
  *
  * Documented simplifications vs the reference (constrained-subset pages
  * make these exact over generator output): no main/article content scoping,
  * sibling walks are flat element-list walks, <picture><source> is folded
  * into img@srcset.
  */
object SpanExtractor {

  sealed trait Elem { def text: String }
  final case class Title(text: String) extends Elem
  final case class Meta(text: String) extends Elem
  final case class Heading(level: Int, text: String) extends Elem
  final case class Para(text: String) extends Elem
  final case class ListEl(ordered: Boolean, items: Seq[String]) extends Elem { def text: String = items.mkString(" ") }
  final case class Quote(text: String) extends Elem
  final case class Img(src: String, alt: String, titleAttr: String, srcset: Option[String], figcaption: Option[String]) extends Elem { def text: String = alt }
  final case class Anchor(href: String, text: String) extends Elem

  private val TitleR = "<title>(.*?)</title>".r
  private val MetaR = """<meta name="description" content="(.*?)">""".r
  private val HeadR = "<h([1-6])>(.*?)</h[1-6]>".r
  private val ParaR = "<p>(.*?)</p>".r
  private val ListR = "<(ul|ol)>(.*)</(?:ul|ol)>".r
  private val LiR = "<li>(.*?)</li>".r
  private val QuoteR = "<blockquote>(.*?)</blockquote>".r
  private val FigR = """<figure>(<img [^>]*>)<figcaption>(.*?)</figcaption></figure>""".r
  private val ImgR = "<img ([^>]*)>".r
  private val AttrR = """(\w+)="([^"]*)"""".r
  private val AnchorR = """<a href="([^"]*)">(.*?)</a>""".r

  def parse(html: String): Seq[Elem] =
    html.split("\n").toSeq.flatMap(parseLine)

  private def parseImg(tag: String, figcaption: Option[String]): Option[Img] = {
    ImgR.findFirstMatchIn(tag).map { m =>
      val attrs = AttrR.findAllMatchIn(m.group(1)).map(a => a.group(1) -> a.group(2)).toMap
      Img(attrs.getOrElse("src", ""), attrs.getOrElse("alt", ""),
        attrs.getOrElse("title", ""), attrs.get("srcset"), figcaption)
    }
  }

  private def parseLine(line: String): Option[Elem] = line match {
    case TitleR(t) => Some(Title(t.trim))
    case MetaR(c) => Some(Meta(c.trim))
    case HeadR(lvl, t) => Some(Heading(lvl.toInt, t.trim))
    case ParaR(t) => Some(Para(t.trim))
    case ListR(tag, inner) =>
      Some(ListEl(tag == "ol", LiR.findAllMatchIn(inner).map(_.group(1).trim).filter(_.nonEmpty).toSeq))
    case QuoteR(t) => Some(Quote(t.trim))
    case FigR(img, cap) => parseImg(img, Some(cap.trim))
    case l if l.startsWith("<img ") => parseImg(l, None)
    case AnchorR(href, t) => Some(Anchor(href, t.trim))
    case _ => None
  }

  final case class ImageRec(
      image_url: String,
      alt_text: String,
      title_attribute: String,
      raw_caption: String,
      elemIndex: Int,
      w: Int,
      h: Int)

  final case class PageExtract(
      pageUrl: String,
      pageTitle: String,
      pageSummary: String,
      spans: Vector[Span],
      links: Vector[(String, String)], // (text, url) helper_classes.py:96-104
      images: Vector[ImageRec], // canonical-dedup winners, first-key order (scraper.py:312-317)
      markdown: String)

  /** Full extraction: HTML → interleaved span sequence + derived fields. */
  def extract(pageUrl: String, html: String): PageExtract = {
    val elems = parse(html).toVector

    val pageTitle = elems.collectFirst { case Title(t) => t }.getOrElse("")
    val pageSummary = elems.collectFirst { case Meta(c) if c.nonEmpty => c }
      .orElse(elems.collectFirst { case Para(t) if t.length > 50 => t })
      .getOrElse("")

    val links = elems.collect { case Anchor(href, t) if t.nonEmpty && href.nonEmpty => (t, href) }

    // ---- image records (G2), validated (P6), canonical-deduped (D4) ----
    val imgRecs: Vector[ImageRec] = elems.zipWithIndex.collect { case (img: Img, i) =>
      resolveImageUrl(pageUrl, img).filter(Predicates.isValidImageUrl).map { u =>
        val (w, h) = UrlFunctions.parseResolution(u)
        ImageRec(u, img.alt, img.titleAttr, surroundingText(elems, i), i, w, h)
      }
    }.flatten

    // group by canonical key preserving first-seen group order; keep the
    // FIRST record attaining max area (python max semantics, scraper.py:314)
    val winnersOrdered: Vector[ImageRec] = {
      val grouped = scala.collection.mutable.LinkedHashMap[String, Vector[ImageRec]]()
      imgRecs.foreach { r =>
        val k = UrlFunctions.canonicaliseUrl(r.image_url)
        grouped.update(k, grouped.getOrElse(k, Vector.empty) :+ r)
      }
      grouped.values.map(g => g.maxBy(r => r.w.toLong * r.h.toLong)).toVector
    }
    val winners: Map[Int, ImageRec] = winnersOrdered.map(r => r.elemIndex -> r).toMap

    // ---- interleaved span assembly (G1 order + winning images in place) ----
    val spans = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, media: String = null): Unit = {
      spans += Span(kind, text, media, off); off += 1
    }
    elems.zipWithIndex.foreach {
      case (Title(t), _) if t.nonEmpty => add(SpanKind.Title, s"# $t")
      case (Meta(c), _) if c.nonEmpty => add(SpanKind.Meta, s"*$c*")
      case (Heading(lvl, t), _) if t.nonEmpty => add(SpanKind.Heading, ("#" * lvl) + " " + t)
      case (Para(t), _) if t.length > 20 => add(SpanKind.Para, t)
      case (ListEl(ordered, items), _) if items.nonEmpty =>
        val prefix = if (ordered) "1. " else "- "
        items.foreach(it => add(SpanKind.ListItem, prefix + it))
      case (Quote(t), _) if t.nonEmpty => add(SpanKind.Quote, s"> $t")
      case (_: Img, i) if winners.contains(i) =>
        val w = winners(i)
        add(SpanKind.Image, w.raw_caption, w.image_url)
      case _ => ()
    }
    val spanSeq = spans.result()
    PageExtract(pageUrl, pageTitle, pageSummary, spanSeq, links, winnersOrdered, renderMarkdown(spanSeq))
  }

  /** Resolve the image URL: srcset best candidate else src, urljoin'd
    * (scraper.py:229-253). Returns None when no src at all.
    */
  def resolveImageUrl(pageUrl: String, img: Img): Option[String] = {
    // python truthiness: `if best:` — an empty-string best candidate (the
    // reference's ", "-separated srcset quirk) falls through to plain src
    val fromSrcset = img.srcset
      .flatMap(ss => UrlFunctions.pickBest(UrlFunctions.parseSrcset(ss)))
      .filter(_.nonEmpty)
    fromSrcset.orElse(if (img.src.nonEmpty) Some(img.src) else None)
      .map(u => UrlFunctions.urljoin(pageUrl, u))
  }

  /** Surrounding text (helper_classes.py:38-82), flat-element-list form.
    * Order: prev, figcaption, caption-keyword sibling, next.
    */
  def surroundingText(elems: Vector[Elem], idx: Int, maxChars: Int = 1000): String = {
    def textOf(e: Elem): String = e match {
      case Para(t) => t
      case Heading(_, t) => t
      case _ => ""
    }
    val prev = elems.take(idx).reverseIterator.map(textOf).find(t => t.length > 10)
    val next = elems.drop(idx + 1).iterator.map(textOf).find(t => t.length > 10)
    val fig = elems(idx) match { case img: Img => img.figcaption.filter(_.nonEmpty); case _ => None }
    val kwSib = elems.slice(idx + 1, idx + 4).collectFirst {
      case Para(t) if Seq("caption", "image", "photo", "picture", "source")
        .exists(k => t.toLowerCase.contains(k)) => t
    }
    val joined = (prev.toSeq ++ fig.toSeq ++ kwSib.toSeq ++ next.toSeq)
      .mkString(" ").replaceAll("\\s+", " ")
    joined.take(maxChars) + (if (joined.length > maxChars) "…" else "")
  }

  /** F9: spans → reference markdown_content (helper_classes.py:116-177).
    * Relies on the generator constraint that two lists are never adjacent;
    * a maximal run of list_item spans is one list and gets the trailing
    * empty line (helper_classes.py:169). Image spans don't render (the
    * reference's markdown has no image lines).
    */
  def renderMarkdown(spans: Seq[Span]): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var inList = false
    spans.foreach { s =>
      if (inList && s.kind != SpanKind.ListItem) { parts += ""; inList = false }
      s.kind match {
        case SpanKind.Title => parts += (s.text + "\n")
        case SpanKind.Meta => parts += (s.text + "\n")
        case SpanKind.Heading | SpanKind.Para | SpanKind.Quote => parts += s.text
        case SpanKind.ListItem => parts += s.text; inList = true
        case _ => () // image
      }
    }
    if (inList) parts += ""
    parts.mkString("\n")
  }

  /** Engine-side doc id (SURVEY §4.4): deterministic hash of the page URL. */
  def docId(url: String): String = f"${Hashing.murmur3_64(url, 0L)}%016x"
}
