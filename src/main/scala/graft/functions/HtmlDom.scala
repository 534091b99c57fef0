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
  * full HTML4 set — ~250 names, identical values in HTML5 — with numeric
  * refs covering the rest; the long tail of HTML5-only multi-codepoint
  * names is omitted) — the extractor's semantics (helper_classes.py,
  * scraper.py) only depend on tree shape, document order, attributes, and
  * text, which this models faithfully for real-world-shaped pages.
  */
object HtmlDom {

  /** Named character references: the full HTML4 set (every name HTML5
    * keeps with an identical value) — Latin-1, Latin Extended ligatures,
    * Greek, general punctuation, letterlike, arrows, math operators,
    * technical and geometric symbols (~250 names; numeric `&#..;` refs
    * cover everything else, and semicolon-less legacy forms pass through
    * verbatim by design). Stored as codepoints, expanded once; values match
    * html.unescape (reference decode path) exactly — incl. lang/rang at
    * the HTML5 mathematical-angle-bracket codepoints.
    */
  private val NamedRefs: Map[String, String] = {
    val cp: Seq[(String, Int)] = Seq(
      // C0 / ASCII
      "quot" -> 0x22, "amp" -> 0x26, "apos" -> 0x27, "lt" -> 0x3C, "gt" -> 0x3E,
      // Latin-1 (U+00A0..U+00FF)
      "nbsp" -> 0xA0, "iexcl" -> 0xA1, "cent" -> 0xA2, "pound" -> 0xA3,
      "curren" -> 0xA4, "yen" -> 0xA5, "brvbar" -> 0xA6, "sect" -> 0xA7,
      "uml" -> 0xA8, "copy" -> 0xA9, "ordf" -> 0xAA, "laquo" -> 0xAB,
      "not" -> 0xAC, "shy" -> 0xAD, "reg" -> 0xAE, "macr" -> 0xAF,
      "deg" -> 0xB0, "plusmn" -> 0xB1, "sup2" -> 0xB2, "sup3" -> 0xB3,
      "acute" -> 0xB4, "micro" -> 0xB5, "para" -> 0xB6, "middot" -> 0xB7,
      "cedil" -> 0xB8, "sup1" -> 0xB9, "ordm" -> 0xBA, "raquo" -> 0xBB,
      "frac14" -> 0xBC, "frac12" -> 0xBD, "frac34" -> 0xBE, "iquest" -> 0xBF,
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acirc" -> 0xC2, "Atilde" -> 0xC3,
      "Auml" -> 0xC4, "Aring" -> 0xC5, "AElig" -> 0xC6, "Ccedil" -> 0xC7,
      "Egrave" -> 0xC8, "Eacute" -> 0xC9, "Ecirc" -> 0xCA, "Euml" -> 0xCB,
      "Igrave" -> 0xCC, "Iacute" -> 0xCD, "Icirc" -> 0xCE, "Iuml" -> 0xCF,
      "ETH" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocirc" -> 0xD4, "Otilde" -> 0xD5, "Ouml" -> 0xD6, "times" -> 0xD7,
      "Oslash" -> 0xD8, "Ugrave" -> 0xD9, "Uacute" -> 0xDA, "Ucirc" -> 0xDB,
      "Uuml" -> 0xDC, "Yacute" -> 0xDD, "THORN" -> 0xDE, "szlig" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acirc" -> 0xE2, "atilde" -> 0xE3,
      "auml" -> 0xE4, "aring" -> 0xE5, "aelig" -> 0xE6, "ccedil" -> 0xE7,
      "egrave" -> 0xE8, "eacute" -> 0xE9, "ecirc" -> 0xEA, "euml" -> 0xEB,
      "igrave" -> 0xEC, "iacute" -> 0xED, "icirc" -> 0xEE, "iuml" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocirc" -> 0xF4, "otilde" -> 0xF5, "ouml" -> 0xF6, "divide" -> 0xF7,
      "oslash" -> 0xF8, "ugrave" -> 0xF9, "uacute" -> 0xFA, "ucirc" -> 0xFB,
      "uuml" -> 0xFC, "yacute" -> 0xFD, "thorn" -> 0xFE, "yuml" -> 0xFF,
      // Latin Extended / spacing modifiers
      "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160, "scaron" -> 0x161,
      "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6, "tilde" -> 0x2DC,
      // Greek
      "Alpha" -> 0x391, "Beta" -> 0x392, "Gamma" -> 0x393, "Delta" -> 0x394,
      "Epsilon" -> 0x395, "Zeta" -> 0x396, "Eta" -> 0x397, "Theta" -> 0x398,
      "Iota" -> 0x399, "Kappa" -> 0x39A, "Lambda" -> 0x39B, "Mu" -> 0x39C,
      "Nu" -> 0x39D, "Xi" -> 0x39E, "Omicron" -> 0x39F, "Pi" -> 0x3A0,
      "Rho" -> 0x3A1, "Sigma" -> 0x3A3, "Tau" -> 0x3A4, "Upsilon" -> 0x3A5,
      "Phi" -> 0x3A6, "Chi" -> 0x3A7, "Psi" -> 0x3A8, "Omega" -> 0x3A9,
      "alpha" -> 0x3B1, "beta" -> 0x3B2, "gamma" -> 0x3B3, "delta" -> 0x3B4,
      "epsilon" -> 0x3B5, "zeta" -> 0x3B6, "eta" -> 0x3B7, "theta" -> 0x3B8,
      "iota" -> 0x3B9, "kappa" -> 0x3BA, "lambda" -> 0x3BB, "mu" -> 0x3BC,
      "nu" -> 0x3BD, "xi" -> 0x3BE, "omicron" -> 0x3BF, "pi" -> 0x3C0,
      "rho" -> 0x3C1, "sigmaf" -> 0x3C2, "sigma" -> 0x3C3, "tau" -> 0x3C4,
      "upsilon" -> 0x3C5, "phi" -> 0x3C6, "chi" -> 0x3C7, "psi" -> 0x3C8,
      "omega" -> 0x3C9, "thetasym" -> 0x3D1, "upsih" -> 0x3D2, "piv" -> 0x3D6,
      // general punctuation
      "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009, "zwnj" -> 0x200C,
      "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F, "ndash" -> 0x2013,
      "mdash" -> 0x2014, "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
      "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
      "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026, "permil" -> 0x2030,
      "prime" -> 0x2032, "Prime" -> 0x2033, "lsaquo" -> 0x2039, "rsaquo" -> 0x203A,
      "oline" -> 0x203E, "frasl" -> 0x2044, "euro" -> 0x20AC,
      // letterlike
      "weierp" -> 0x2118, "image" -> 0x2111, "real" -> 0x211C, "trade" -> 0x2122,
      "alefsym" -> 0x2135,
      // arrows
      "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192, "darr" -> 0x2193,
      "harr" -> 0x2194, "crarr" -> 0x21B5, "lArr" -> 0x21D0, "uArr" -> 0x21D1,
      "rArr" -> 0x21D2, "dArr" -> 0x21D3, "hArr" -> 0x21D4,
      // math operators
      "forall" -> 0x2200, "part" -> 0x2202, "exist" -> 0x2203, "empty" -> 0x2205,
      "nabla" -> 0x2207, "isin" -> 0x2208, "notin" -> 0x2209, "ni" -> 0x220B,
      "prod" -> 0x220F, "sum" -> 0x2211, "minus" -> 0x2212, "lowast" -> 0x2217,
      "radic" -> 0x221A, "prop" -> 0x221D, "infin" -> 0x221E, "ang" -> 0x2220,
      "and" -> 0x2227, "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222A,
      "int" -> 0x222B, "there4" -> 0x2234, "sim" -> 0x223C, "cong" -> 0x2245,
      "asymp" -> 0x2248, "ne" -> 0x2260, "equiv" -> 0x2261, "le" -> 0x2264,
      "ge" -> 0x2265, "sub" -> 0x2282, "sup" -> 0x2283, "nsub" -> 0x2284,
      "sube" -> 0x2286, "supe" -> 0x2287, "oplus" -> 0x2295, "otimes" -> 0x2297,
      "perp" -> 0x22A5, "sdot" -> 0x22C5,
      // technical / geometric / card symbols
      "lceil" -> 0x2308, "rceil" -> 0x2309, "lfloor" -> 0x230A, "rfloor" -> 0x230B,
      "lang" -> 0x27E8, "rang" -> 0x27E9, "loz" -> 0x25CA, "spades" -> 0x2660,
      "clubs" -> 0x2663, "hearts" -> 0x2665, "diams" -> 0x2666)
    cp.iterator.map { case (n, c) => n -> new String(Character.toChars(c)) }.toMap
  }

  /** Decode character references the way BeautifulSoup hands text to the
    * extractor: `&#NN;`, `&#xHH;`, and named refs from the HTML4 table;
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
