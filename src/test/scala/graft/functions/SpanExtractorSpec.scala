package graft.functions

import graft.model.SpanKind
import org.scalatest.funsuite.AnyFunSuite

class SpanExtractorSpec extends AnyFunSuite {

  val pageUrl = "https://host1.example/wiki/page1.html"

  test("ordered interleaved extraction with markdown parity (helper_classes.py:113-177)") {
    val html =
      """<title>My Page</title>
        |<meta name="description" content="a summary here">
        |<h2>Section One</h2>
        |<p>short</p>
        |<p>this paragraph is long enough to survive the filter</p>
        |<ul><li>alpha</li><li>beta</li></ul>
        |<blockquote>quoted text</blockquote>
        |<img src="https://host1.example/images/img1-640x400.jpg" alt="pic">
        |<ol><li>one</li></ol>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    assert(ex.pageTitle == "My Page")
    assert(ex.pageSummary == "a summary here")
    val kinds = ex.spans.map(_.kind)
    assert(kinds == Vector("title", "meta", "heading", "para", "list_item",
      "list_item", "quote", "image", "list_item"))
    assert(ex.spans.map(_.offset) == (0 until 9).toVector)
    assert(ex.spans(2).text == "## Section One")
    assert(ex.spans(4).text == "- alpha")
    assert(ex.spans(8).text == "1. one")
    assert(ex.spans(6).text == "> quoted text")
    assert(ex.spans(7).media_ref == "https://host1.example/images/img1-640x400.jpg")
    // markdown: title/meta carry "\n", list gets trailing empty line, image absent
    assert(ex.markdown ==
      "# My Page\n\n*a summary here*\n\n## Section One\n" +
        "this paragraph is long enough to survive the filter\n" +
        "- alpha\n- beta\n\n> quoted text\n1. one\n")
  }

  test("entities decode in text runs and attributes; script stays raw (BeautifulSoup parity)") {
    val html =
      """<title>Fish &amp; Chips &#x27;best&#x27;</title>
        |<meta name="description" content="tea &amp; scones &copy; caf&eacute;">
        |<h2>A &lt;tag&gt; &ndash; 5&#176; &euro;9</h2>
        |<p>this &quot;quoted&quot; paragraph is long enough to survive the filter &amp; then some</p>
        |<script>if (a &amp;&amp; b) x = 1;</script>
        |<p>unknown &nosuch; stays &amp verbatim and so does a lone & ampersand ok</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    assert(ex.pageTitle == "Fish & Chips 'best'")
    assert(ex.pageSummary == "tea & scones © café")
    assert(ex.spans.find(_.kind == "heading").get.text == "## A <tag> – 5° €9")
    assert(ex.spans.exists(_.text.contains("this \"quoted\" paragraph")))
    // unrecognized/unterminated refs pass through verbatim
    assert(ex.spans.exists(_.text.contains("unknown &nosuch; stays &amp verbatim")))
    // script raw text is NOT entity-decoded (html.parser CDATA mode)
    val script = HtmlDom.parse(html).findAll(Set("script")).head
    assert(script.children.head == Right("if (a &amp;&amp; b) x = 1;"))
  }

  test("full HTML4 entity table: fractions, ligatures, Greek, arrows, math decode like html.unescape") {
    val html =
      """<title>&frac12; cup &OElig;uvre &mdash; &oelig;uvres</title>
        |<meta name="description" content="&alpha;&beta;&gamma; &rarr; &infin; &ne; &empty;">
        |<h2>&Sigma;x &le; &frac34; &middot; &lang;v&rang; &hearts;</h2>
        |<p>temperature &plusmn;2&deg; at &asymp;45&permil; humidity keeps the archive &sect;7 compliant</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    // expected strings are the exact html.unescape values (U+00BD, U+0152,
    // U+0153, Greek block, U+2192/U+221E/U+2260/U+2205, U+27E8/U+27E9...)
    assert(ex.pageTitle == "½ cup Œuvre — œuvres")
    assert(ex.pageSummary == "αβγ → ∞ ≠ ∅")
    assert(ex.spans.find(_.kind == "heading").get.text ==
      "## Σx ≤ ¾ · ⟨v⟩ ♥")
    assert(ex.spans.exists(_.text.contains("±2° at ≈45‰")))
  }

  test("HTML5-only entities decode like html.unescape, incl. the multi-codepoint names") {
    // names absent from HTML4: ShortRightArrow, varnothing, imath, bopf
    // (astral plane U+1D553), semi, CenterDot — expected literals are the
    // exact Python html.unescape values
    val html =
      """<title>x &ShortRightArrow; y &semi; z</title>
        |<meta name="description" content="&varnothing; &imath; &CenterDot; &numero;">
        |<p>board &bopf; and &DoubleRightTee; close the proof here with enough words to pass</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    assert(ex.pageTitle == "x → y ; z")
    assert(ex.pageSummary == "∅ ı · №")
    assert(ex.spans.exists(_.text.contains("board 𝕓 and ⊨ close")))
    // the 93 multi-codepoint names (the last named-reference gap, closed
    // r5): combining-slash negations, the fj ligature, variant-selector
    // forms — byte-identical to html.unescape
    val ex2 = SpanExtractor.extract(pageUrl,
      "<title>a &NotGreaterFullEqual; b &fjlig; c &nsubset; d &varsubsetneqq; e</title>")
    assert(ex2.pageTitle == "a ≧̸ b fj c ⊂⃒ d ⫋︀ e")
  }

  test("implied end tags: table/dd/option content lands in the right cells") {
    val root = HtmlDom.parse(
      """<table>
        |<tr><td>cell one<td>cell two
        |<tr><th>head a<td>cell b
        |</table>
        |<dl><dt>term<dd>def one<dd>def two</dl>
        |<select><option>first<option>second</select>""".stripMargin)
    val cells = root.findAll(Set("td", "th"))
    assert(cells.map(_.textStrip) == Vector("cell one", "cell two", "head a", "cell b"))
    // each cell is a SIBLING under its row, not nested inside the previous cell
    assert(cells.forall(c => c.parent.tag == "tr"))
    val rows = root.findAll(Set("tr"))
    assert(rows.size == 2 && rows.forall(_.parent.tag == "table"))
    val dds = root.findAll(Set("dd", "dt"))
    assert(dds.map(_.textStrip) == Vector("term", "def one", "def two"))
    assert(dds.forall(_.parent.tag == "dl"))
    val opts = root.findAll(Set("option"))
    assert(opts.map(_.textStrip) == Vector("first", "second"))
    assert(opts.forall(_.parent.tag == "select"))
  }

  test("summary fallback: first <p> longer than 50 chars (helper_classes.py:31-36)") {
    val html =
      """<title>T</title>
        |<p>too short for summary</p>
        |<p>this paragraph is definitely longer than fifty characters in total</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    assert(ex.pageSummary.startsWith("this paragraph is definitely"))
  }

  test("image canonical dedup keeps max-area, first-maximal tie-break (scraper.py:302-317)") {
    val html =
      """<title>T</title>
        |<p>context paragraph before image</p>
        |<img src="https://host1.example/images/img9-320x200.jpg" alt="small">
        |<img src="https://host1.example/images/img9-1280x800.jpg" alt="big">
        |<img src="https://host1.example/images/img9-640x400.jpg" alt="mid">""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val imgs = ex.spans.filter(_.kind == SpanKind.Image)
    assert(imgs.size == 1)
    assert(imgs.head.media_ref.endsWith("img9-1280x800.jpg"))
    assert(ex.images.map(_.alt_text) == Vector("big"))
  }

  test("invalid image URLs are dropped; relative srcs resolve against the page (P6/F8)") {
    val html =
      """<title>T</title>
        |<img src="/images/img5-640x400.jpg" alt="rel">
        |<img src="https://x.doubleclick.net/img/banner1.jpg" alt="ad">
        |<img src="https://host1.example/assets/style3.svg" alt="svg">""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val imgs = ex.spans.filter(_.kind == SpanKind.Image)
    assert(imgs.map(_.media_ref) == Vector("https://host1.example/images/img5-640x400.jpg"))
  }

  test("srcset beats src; ', '-separated srcset exhibits the reference quirk (scraper.py:216-227)") {
    // comma-only separator: clean parse, 1280w candidate wins over src
    val clean =
      """<title>T</title>
        |<img src="https://host1.example/images/img1-320x200.jpg" alt="x" srcset="https://host1.example/images/a-640x400.jpg 640w,https://host1.example/images/b-1280x800.jpg 1280w">""".stripMargin
    assert(SpanExtractor.extract(pageUrl, clean).spans.filter(_.kind == SpanKind.Image)
      .head.media_ref.endsWith("b-1280x800.jpg"))
    // ", " separator: second entry parses as url "" (reference split quirk),
    // first entry (640w) is the max and wins
    val quirky =
      """<title>T</title>
        |<img src="https://host1.example/images/img1-320x200.jpg" alt="x" srcset="https://host1.example/images/a-640x400.jpg 640w, https://host1.example/images/b-1280x800.jpg 1280w">""".stripMargin
    assert(SpanExtractor.extract(pageUrl, quirky).spans.filter(_.kind == SpanKind.Image)
      .head.media_ref.endsWith("a-640x400.jpg"))
    // srcset whose best is "" falls back to plain src (python truthiness)
    val fallback =
      """<title>T</title>
        |<img src="https://host1.example/images/img1-320x200.jpg" alt="x" srcset=" only.jpg 9999w">""".stripMargin
    assert(SpanExtractor.extract(pageUrl, fallback).spans.filter(_.kind == SpanKind.Image)
      .head.media_ref.endsWith("img1-320x200.jpg"))
  }

  test("surrounding text: prev + figcaption + keyword-sibling + next, 1000-char cap (helper_classes.py:38-82)") {
    val html =
      """<title>T</title>
        |<p>previous paragraph with plenty of text</p>
        |<figure><img src="https://host1.example/images/img2-640x400.jpg" alt="a"><figcaption>the caption</figcaption></figure>
        |<p>look at this photo of the city</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val img = ex.spans.filter(_.kind == SpanKind.Image).head
    // order: prev, figcaption, next. The keyword-sibling scan walks the
    // img's REAL siblings (inside <figure> there are none of p/div/span),
    // faithful to find_next_siblings in helper_classes.py:72-76 — round 1's
    // flat-list walk found the outside paragraph twice.
    assert(img.text == "previous paragraph with plenty of text the caption " +
      "look at this photo of the city")
    // cap at 1000 chars + ellipsis
    val longText = "x" * 600
    val html2 = s"""<title>T</title>
        |<p>$longText</p>
        |<img src="https://host1.example/images/img3.jpg" alt="b">
        |<p>$longText</p>""".stripMargin
    val cap = SpanExtractor.extract(pageUrl, html2).spans.filter(_.kind == SpanKind.Image).head.text
    assert(cap.length == 1001 && cap.endsWith("…"))
  }

  test("nested/messy HTML: wrappers, whitespace, attribute variance, implied closes") {
    val html =
      """<html><head>
        |  <TITLE>  Messy Page </TITLE>
        |  <meta   content='the description'   name="description" >
        |</head><body>
        |<div id="nav"><ul><li>nav item that is ignored? no - find_all sees it</li></ul></div>
        |<div class="site-content">
        |  <h2>
        |     Section   One</h2>
        |  <p>this paragraph is <b>long</b> enough to survive the filter ok</p>
        |  <ul>
        |    <li>alpha
        |    <li>beta</ul>
        |  <blockquote>a quote with plenty of text inside</blockquote>
        |</div>
        |</body></html>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    assert(ex.pageTitle == "Messy Page")
    assert(ex.pageSummary == "the description")
    // content scoping: the nav <ul> outside div.site-content is NOT emitted
    val kinds = ex.spans.map(_.kind)
    assert(kinds == Vector("title", "meta", "heading", "para", "list_item",
      "list_item", "quote"))
    // get_text(strip=True): each string trimmed at its EDGES (internal
    // whitespace kept), empty dropped, joined with ""
    assert(ex.spans(2).text == "## Section   One")
    assert(ex.spans(3).text == "this paragraph islongenough to survive the filter ok")
    assert(ex.spans(4).text == "- alpha" && ex.spans(5).text == "- beta")
    assert(ex.spans(6).text == "> a quote with plenty of text inside")
  }

  test("content scoping prefers main over article over div[class~content]") {
    val html =
      """<title>T</title>
        |<article><p>article paragraph long enough to be emitted yes</p></article>
        |<main><p>main paragraph long enough to be emitted indeed</p></main>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val paras = ex.spans.filter(_.kind == SpanKind.Para).map(_.text)
    assert(paras == Vector("main paragraph long enough to be emitted indeed"))
  }

  test("picture>source srcset wins over img srcset and src (scraper.py:231-246)") {
    val html =
      """<title>T</title>
        |<picture>
        |  <source srcset=" s1-320x200.jpg 9999w">
        |  <source srcset="https://host1.example/images/s2-1280x800.jpg 1280w">
        |  <img src="https://host1.example/images/fallback-640x400.jpg" alt="x">
        |</picture>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val img = ex.spans.filter(_.kind == SpanKind.Image).head
    // first <source>'s leading-space split quirk yields best="" (falsy) ->
    // the loop advances to the second source (scraper.py:233-238)
    assert(img.media_ref == "https://host1.example/images/s2-1280x800.jpg")
  }

  test("nested elements: p inside blockquote emitted by both (find_all semantics)") {
    val html =
      """<title>T</title>
        |<blockquote><p>a nested paragraph that is long enough to pass</p></blockquote>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val kinds = ex.spans.map(_.kind)
    assert(kinds == Vector("title", "quote", "para"))
    assert(ex.spans(1).text == "> a nested paragraph that is long enough to pass")
  }

  test("surrounding text climbs out of wrapper divs to find context") {
    val html =
      """<title>T</title>
        |<p>context paragraph before the wrapped image</p>
        |<div><div><img src="https://host1.example/images/img7-640x400.jpg" alt="deep"></div></div>
        |<p>context paragraph after the wrapped image</p>""".stripMargin
    val ex = SpanExtractor.extract(pageUrl, html)
    val img = ex.spans.filter(_.kind == SpanKind.Image).head
    assert(img.text == "context paragraph before the wrapped image " +
      "context paragraph after the wrapped image")
  }

  test("messy-wrapper property: generator page content survives div nesting intact") {
    import graft.synth.{SyntheticWeb, WebConfig}
    val cfg = WebConfig(seed = 11, nHosts = 20)
    for (i <- 1 to 8) {
      val url = SyntheticWeb.pageUrl(cfg, 1 + i % 10, i.toLong)
      SyntheticWeb.fetch(cfg, url).foreach { flat =>
        val base = SpanExtractor.extract(url, flat)
        // wrap the whole body in nested wrapper divs + noise: spans must be
        // IDENTICAL (wrappers don't scope: class carries no content keyword)
        val messy = "<div id=\"outer\">\n<div class=\"wrapper\">\n" +
          flat.replace("\n", "\n  ") +
          "\n</div><!-- trailing comment --></div><script>var x = '<p>no</p>';</script>"
        val wrapped = SpanExtractor.extract(url, messy)
        assert(wrapped.spans == base.spans, s"spans diverged for $url")
        assert(wrapped.pageTitle == base.pageTitle && wrapped.pageSummary == base.pageSummary)
        assert(wrapped.links == base.links)
        assert(wrapped.markdown == base.markdown)
      }
    }
  }

  test("generator pages round-trip deterministically (FIXTURES §1 invertibility)") {
    import graft.synth.{SyntheticWeb, WebConfig}
    val cfg = WebConfig(seed = 7, nHosts = 20)
    val url = SyntheticWeb.pageUrl(cfg, 3, 2L)
    val h1 = SyntheticWeb.pageHtml(cfg, url)
    val h2 = SyntheticWeb.pageHtml(cfg, url)
    assert(h1 == h2)
    val e1 = SpanExtractor.extract(url, h1)
    val e2 = SpanExtractor.extract(url, h2)
    assert(e1.spans == e2.spans)
    assert(e1.spans.nonEmpty)
  }
}
