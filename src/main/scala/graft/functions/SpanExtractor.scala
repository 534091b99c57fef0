package graft.functions

import graft.model.{Span, SpanKind}
import graft.util.Hashing
import HtmlDom.Node

/** Ordered, interleaved page extraction producing the input_hint span
  * sequence. Re-expresses the reference's single-pass DOM extraction over a
  * real (if minimal) DOM — nested elements, whitespace/attribute variance,
  * content-area scoping and `<picture><source>` all behave like the
  * reference, not just on the generator's one-element-per-line subset.
  *
  * Semantics mirrored from the reference:
  *  - content-area scoping: first `main`, else `article`, else a `div`
  *    whose class matches content|main|article, else the whole document
  *    (helper_classes.py:106-110)
  *  - document order = element order; title → "# {t}\n", meta description →
  *    "*{c}*\n" lead the sequence (helper_classes.py:116-124); h1..h6 →
  *    "#"*level + " " + text (helper_classes.py:132-142); <p> kept only when
  *    len(text) > 20 (helper_classes.py:146); list items "- {t}" / "1. {t}"
  *    with an empty markdown line after each list (helper_classes.py:151-169);
  *    blockquote → "> {t}" (helper_classes.py:171-173); nested matches are
  *    emitted like find_all does (a <p> inside a <blockquote> appears in
  *    both)
  *  - text extraction = get_text(strip=True): stripped non-empty strings
  *    joined with ""
  *  - page summary = meta description / og:description / twitter:description
  *    else first <p> with len > 50 (helper_classes.py:19-36)
  *  - image URL resolution: `<picture><source srcset>` best candidate first
  *    (scraper.py:231-238), else img srcset best (first maximal (\d+)(w|x)
  *    descriptor; the ", " split quirk and python `if best:` truthiness are
  *    preserved), else src; resolved against the page URL, then validated
  *    (scraper.py:216-255)
  *  - per-page canonical image dedup keeping max w*h, first-maximal
  *    tie-break (scraper.py:302-317)
  *  - image raw_caption = surrounding text with the reference's sibling
  *    walks: nearest prev/next sibling text (>10 chars, p/div/h1..h6 or
  *    string siblings) climbing to the parent when siblings exhaust,
  *    figcaption from the figure|picture ancestor, caption-keyword among
  *    the next 3 p/div/span siblings; joined, whitespace-collapsed,
  *    truncated at 1000 chars with "…" (helper_classes.py:38-82)
  *
  * HTML entity decoding happens at parse time in [[HtmlDom]] (numeric
  * references plus the named-entity table, matching BeautifulSoup's
  * fully-decoded text the reference operates on — helper_classes.py:85-179);
  * see HtmlDom's scaladoc for the named-entity coverage boundary.
  */
object SpanExtractor {

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

  private val ContentTags = Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "ol", "blockquote")
  private val TextTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6")
  private val ClassScopeRe = "content|main|article".r
  // hot-loop statics: this code runs once per page / per image — patterns
  // and sets are compiled/allocated once, never per call
  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  private val KwSibTags = Set("p", "div", "span")
  private val CaptionKeywords = Seq("caption", "image", "photo", "picture", "source")
  private val LiTag = Set("li")

  /** Full extraction: HTML → interleaved span sequence + derived fields. */
  def extract(pageUrl: String, html: String): PageExtract = {
    val root = HtmlDom.parse(html)
    val all = root.elements

    val pageTitle = all.find(_.tag == "title").map(_.textStrip).getOrElse("")
    def meta(key: String, value: String): Option[String] =
      all.find(n => n.tag == "meta" && n.attrs.get(key).contains(value))
        .flatMap(_.attrs.get("content")).map(_.trim).filter(_.nonEmpty)
    val metaDesc = meta("name", "description")
    val pageSummary = metaDesc
      .orElse(meta("property", "og:description"))
      .orElse(meta("name", "twitter:description"))
      .orElse(all.iterator.filter(_.tag == "p").map(_.textStrip).find(_.length > 50))
      .getOrElse("")

    val links = all.iterator
      .filter(n => n.tag == "a" && n.attrs.contains("href"))
      .map(n => (n.textStrip, n.attrs("href")))
      .filter { case (t, h) => t.nonEmpty && h.nonEmpty }
      .toVector

    // ---- content-area scoping (helper_classes.py:106-110) --------------
    val mainContent: Node = all.find(_.tag == "main")
      .orElse(all.find(_.tag == "article"))
      .orElse(all.find(n => n.tag == "div" && n.attrs.get("class").exists(cls =>
        WsRun.split(cls).exists(c => ClassScopeRe.findFirstIn(c).isDefined))))
      .getOrElse(root)

    val contentEls = mainContent.findAll(ContentTags)

    // ---- image records (G2), validated (P6), canonical-deduped (D4) ----
    val imgRecs: Vector[ImageRec] = all.filter(_.tag == "img").flatMap { img =>
      resolveImageUrl(pageUrl, img).filter(Predicates.isValidImageUrl).map { u =>
        val (w, h) = UrlFunctions.parseResolution(u)
        ImageRec(u, img.attrs.getOrElse("alt", "").trim,
          img.attrs.getOrElse("title", "").trim, surroundingText(img), img.index, w, h)
      }
    }

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
    if (pageTitle.nonEmpty) add(SpanKind.Title, s"# $pageTitle")
    metaDesc.foreach(c => add(SpanKind.Meta, s"*$c*"))
    // content elements (scoped) and images (whole doc) merged by preorder
    // document position — the interleaved sequence the input_hint requires
    val events: Vector[Node] =
      (contentEls ++ all.filter(n => n.tag == "img" && winners.contains(n.index)))
        .sortBy(_.index)
    events.foreach { n =>
      n.tag match {
        case "img" =>
          val w = winners(n.index)
          add(SpanKind.Image, w.raw_caption, w.image_url)
        case "p" =>
          val t = n.textStrip
          if (t.length > 20) add(SpanKind.Para, t)
        case "ul" | "ol" =>
          val prefix = if (n.tag == "ol") "1. " else "- "
          n.findAll(LiTag).map(_.textStrip).filter(_.nonEmpty)
            .foreach(it => add(SpanKind.ListItem, prefix + it))
        case "blockquote" =>
          val t = n.textStrip
          if (t.nonEmpty) add(SpanKind.Quote, s"> $t")
        case h if h.startsWith("h") =>
          val t = n.textStrip
          if (t.nonEmpty) add(SpanKind.Heading, ("#" * h.drop(1).toInt) + " " + t)
        case _ => ()
      }
    }
    val spanSeq = spans.result()
    PageExtract(pageUrl, pageTitle, pageSummary, spanSeq, links, winnersOrdered,
      renderMarkdown(spanSeq))
  }

  /** Resolve the image URL (scraper.py:229-253): highest-res
    * `<picture><source srcset>` first, then img srcset, then plain src —
    * each srcset pick subject to python truthiness (an empty-string best
    * candidate, the ", " split quirk, falls through).
    */
  def resolveImageUrl(pageUrl: String, img: Node): Option[String] = {
    val fromPicture = img.ancestor(Set("picture")).flatMap { pic =>
      pic.findAll(Set("source")).iterator
        .flatMap(_.attrs.get("srcset").filter(_.nonEmpty))
        .flatMap(ss => UrlFunctions.pickBest(UrlFunctions.parseSrcset(ss)).filter(_.nonEmpty))
        .nextOption()
    }
    val fromSrcset = img.attrs.get("srcset").filter(_.nonEmpty)
      .flatMap(ss => UrlFunctions.pickBest(UrlFunctions.parseSrcset(ss)))
      .filter(_.nonEmpty)
    fromPicture.orElse(fromSrcset)
      .orElse(img.attrs.get("src").filter(_.nonEmpty))
      .map(u => UrlFunctions.urljoin(pageUrl, u))
  }

  /** Surrounding text (helper_classes.py:38-82) with the reference's walk:
    * prev sibling scan (climbing to the parent chain when siblings exhaust,
    * stopping at html/body/document), figcaption from the figure|picture
    * ancestor, caption-keyword among the next 3 p/div/span siblings, next
    * sibling scan. String siblings count (NavigableString branch).
    */
  def surroundingText(img: Node, maxChars: Int = 1000): String = {
    def textOf(c: Either[Node, String]): String = c match {
      case Right(s) => s.trim
      case Left(n) if TextTags(n.tag) => n.textStrip
      case _ => ""
    }

    def nearby(start0: Node, prevDir: Boolean): Option[String] = {
      var start = start0
      var pos = start.childPos
      var parent = start.parent
      while (true) {
        pos = if (prevDir) pos - 1 else pos + 1
        if (pos < 0 || pos >= parent.children.length) {
          val up = start.parent
          if (up != null && up.tag != "html" && up.tag != "body" && up.tag != "[document]") {
            start = up; parent = start.parent; pos = start.childPos
          } else return None
        } else {
          val t = textOf(parent.children(pos))
          if (t.length > 10) return Some(t)
        }
      }
      None
    }

    val fig = img.ancestor(Set("figure", "picture"))
      .flatMap(_.findAll(Set("figcaption")).headOption)
      .map(_.textStrip).filter(_.nonEmpty)

    val kwSib = img.parent.children.iterator.drop(img.childPos + 1)
      .collect { case Left(n) if KwSibTags(n.tag) => n.textStrip }
      .take(3)
      .find(t => t.nonEmpty && {
        val tl = t.toLowerCase
        CaptionKeywords.exists(tl.contains)
      })

    val joined = (nearby(img, prevDir = true).toSeq ++ fig.toSeq ++ kwSib.toSeq ++
      nearby(img, prevDir = false).toSeq)
      .mkString(" ")
    val collapsed = WsRun.matcher(joined).replaceAll(" ")
    collapsed.take(maxChars) + (if (collapsed.length > maxChars) "…" else "")
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
