package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML DOM for the span extractor — the offline stand-in for the
  * reference's BeautifulSoup(html.parser) subset the pipeline exercises:
  * nested elements, attribute order/whitespace/quote variance, void
  * elements, comments/doctype, script/style raw text, mismatched close tags
  * (pop-to-match), implied end tags for list/table/definition/option
  * content, and character-reference decoding (numeric `&#..;`/`&#x..;` +
  * the named core set) in text runs and attribute values — script/style
  * raw text is NOT decoded, matching html.parser CDATA handling.
  *
  * Deliberately NOT a spec-complete parser (the named-entity table is the
  * common core, not all 2k HTML5 refs) — the extractor's semantics
  * (helper_classes.py, scraper.py) only depend on tree shape, document
  * order, attributes, and text, which this models faithfully for
  * real-world-shaped pages.
  */
object HtmlDom {

  /** Named character references (common core; numeric refs cover the rest). */
  private val NamedRefs: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "middot" -> "·",
    "bull" -> "•", "dagger" -> "†", "sect" -> "§",
    "para" -> "¶", "micro" -> "µ", "euro" -> "€",
    "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "eacute" -> "é", "egrave" -> "è", "iacute" -> "í",
    "oacute" -> "ó", "uacute" -> "ú", "ntilde" -> "ñ",
    "ouml" -> "ö", "uuml" -> "ü", "auml" -> "ä")

  /** Decode character references the way BeautifulSoup hands text to the
    * extractor: `&#NN;`, `&#xHH;`, and named refs from the core table;
    * anything unrecognized passes through verbatim.
    */
  def decodeEntities(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new java.lang.StringBuilder(s.length) // 3-arg append(CharSequence,int,int)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      val semi = s.indexOf(';', amp + 1)
      // entity names are short; a distant ';' means this '&' is literal
      if (semi > amp && semi - amp <= 10) {
        val body = s.substring(amp + 1, semi)
        val decoded: Option[String] =
          if (body.startsWith("#x") || body.startsWith("#X"))
            try Some(Character.toString(Integer.parseInt(body.drop(2), 16)))
            catch { case _: Exception => None }
          else if (body.startsWith("#"))
            try Some(Character.toString(Integer.parseInt(body.drop(1))))
            catch { case _: Exception => None }
          else NamedRefs.get(body)
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1
          case None => sb.append('&'); i = amp + 1
        }
      } else { sb.append('&'); i = amp + 1 }
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  /** Implied end tags: an opening tag in the KEY set pops any open tag in
    * the VALUE set first (the html.parser-builder behavior for messy pages
    * that omit `</li>`, `</td>`, `</dd>`, `</option>`, ...).
    */
  private val ImpliedClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "p" -> Set("p"),
    "dd" -> Set("dd", "dt"), "dt" -> Set("dd", "dt"),
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "tr" -> Set("td", "th", "tr"),
    "thead" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "tbody" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "tfoot" -> Set("td", "th", "tr", "tbody", "thead", "tfoot"),
    "option" -> Set("option"),
    "optgroup" -> Set("option", "optgroup"))

  /** Element node; children hold elements and text runs in document order.
    * `childPos` = position among the parent's children (text runs count —
    * the sibling walks in surrounding-text need string siblings, mirroring
    * NavigableString handling in helper_classes.py:58-63).
    */
  final class Node(val tag: String, val attrs: Map[String, String],
                   val parent: Node, val childPos: Int) {
    val children: ArrayBuffer[Either[Node, String]] = ArrayBuffer.empty
    var index: Int = -1 // preorder document position

    /** BeautifulSoup get_text(strip=True): stripped non-empty descendant
      * strings joined with "". Memoized — the tree is immutable after
      * parse, and the extraction passes (summary fallback, links, content
      * spans, per-image surrounding-text walks) hit the same nodes
      * repeatedly.
      */
    private var textStripCache: String = null
    def textStrip: String = {
      if (textStripCache == null) {
        val sb = new StringBuilder
        def walk(n: Node): Unit = n.children.foreach {
          case Right(s) => val t = s.trim; if (t.nonEmpty) sb.append(t)
          case Left(c) => walk(c)
        }
        walk(this)
        textStripCache = sb.toString
      }
      textStripCache
    }

    /** Descendant elements with any of `tags`, document order (like
      * find_all: nested matches included).
      */
    def findAll(tags: Set[String]): Vector[Node] = {
      val out = Vector.newBuilder[Node]
      def walk(n: Node): Unit = n.children.foreach {
        case Left(c) => if (tags(c.tag)) out += c; walk(c)
        case _ => ()
      }
      walk(this)
      out.result()
    }

    /** All descendant elements, document order. */
    def elements: Vector[Node] = {
      val out = Vector.newBuilder[Node]
      def walk(n: Node): Unit = n.children.foreach {
        case Left(c) => out += c; walk(c)
        case _ => ()
      }
      walk(this)
      out.result()
    }

    /** Nearest ancestor with one of `tags` (find_parent). */
    def ancestor(tags: Set[String]): Option[Node] = {
      var p = parent
      while (p != null && !tags(p.tag)) p = p.parent
      Option(p)
    }
  }

  /** HTML void elements (never pushed on the open stack). */
  val Void: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")

  def parse(html: String): Node = {
    val root = new Node("[document]", Map.empty, null, 0)
    var stack: List[Node] = List(root)
    var i = 0

    def addText(s: String): Unit =
      if (s.nonEmpty) stack.head.children += Right(decodeEntities(s))

    /** '>' terminating a tag, skipping quoted attribute values. */
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < html.length) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j
        j += 1
      }
      -1
    }

    while (i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = html.length }
      else {
        addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) html.length else end + 3
        } else if (lt + 1 < html.length && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) html.length else end + 1
        } else if (html.startsWith("</", lt)) {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) html.length else end).trim.toLowerCase
          if (stack.exists(_.tag == name)) {
            while (stack.head.tag != name) stack = stack.tail
            if (stack.head.tag != "[document]") stack = stack.tail
          }
          i = if (end < 0) html.length else end + 1
        } else {
          val end = tagEnd(lt + 1)
          if (end < 0) { addText(html.substring(lt)); i = html.length }
          else {
            val inner = html.substring(lt + 1, end).trim
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val name = (if (sp < 0) body else body.take(sp)).toLowerCase
            if (name.isEmpty || !name.head.isLetter) {
              addText(html.substring(lt, end + 1)); i = end + 1
            } else {
              val attrs = parseAttrs(if (sp < 0) "" else body.drop(sp))
              // implied end tags (messy pages omit </li>, </td>, </dd>, ...):
              // pop every open tag the new tag implicitly closes
              ImpliedClose.get(name).foreach { closes =>
                while (closes(stack.head.tag)) stack = stack.tail
              }
              val node = new Node(name, attrs, stack.head, stack.head.children.length)
              stack.head.children += Left(node)
              if (name == "script" || name == "style") {
                val close = html.indexOf(s"</$name", end + 1)
                if (close >= 0) {
                  node.children += Right(html.substring(end + 1, close))
                  val cEnd = html.indexOf('>', close)
                  i = if (cEnd < 0) html.length else cEnd + 1
                } else i = html.length
              } else {
                if (!selfClose && !Void(name)) stack = node :: stack
                i = end + 1
              }
            }
          }
        }
      }
    }

    var idx = 0
    def number(n: Node): Unit = {
      n.index = idx; idx += 1
      n.children.foreach { case Left(c) => number(c); case _ => () }
    }
    number(root)
    root
  }

  private def parseAttrs(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == '/')) i += 1
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
      val name = s.substring(start, i).toLowerCase
      if (name.nonEmpty) {
        var j = i
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == '=') {
          j += 1
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val vEnd = s.indexOf(q, j + 1)
            val v = if (vEnd < 0) s.substring(j + 1) else s.substring(j + 1, vEnd)
            out += name -> decodeEntities(v)
            i = if (vEnd < 0) s.length else vEnd + 1
          } else {
            val vStart = j
            while (j < s.length && !s.charAt(j).isWhitespace) j += 1
            out += name -> decodeEntities(s.substring(vStart, j))
            i = j
          }
        } else { out += name -> ""; i = i.max(j) }
      } else if (i == start) i += 1
    }
    out.result()
  }
}
