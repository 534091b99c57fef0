package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Truth tables quoted from the reference implementation
  * (/root/reference/app/core/scraper.py, app/utils/helper_classes.py).
  */
class FunctionsSpec extends AnyFunSuite {

  // ------------------------------------------------ canonicalise (scraper.py:56-62)
  test("canonicalise strips /WxH/ path segments") {
    assert(UrlFunctions.canonicaliseUrl("https://A.com/640/400/upload/pic1") ==
      "https://a.com/upload/pic1")
  }
  test("canonicalise strips -WxH suffix before extension") {
    assert(UrlFunctions.canonicaliseUrl("https://a.com/images/img7-640x400.jpg") ==
      "https://a.com/images/img7.jpg")
  }
  test("canonicalise strips w/h/size query params, trailing slash, fragment") {
    // reference quirk (scraper.py:61): the regex needs a leading '?' or '&',
    // but urlsplit's query has neither on the FIRST param — so the first
    // query param survives canonicalisation
    assert(UrlFunctions.canonicaliseUrl("HTTPS://Host.com/img/a.png/?w=100#frag") ==
      "https://host.com/img/a.png?w=100")
    assert(UrlFunctions.canonicaliseUrl("https://h.com/a.png?q=1&width=640") ==
      "https://h.com/a.png?q=1")
  }

  // ------------------------------------- resolution parse (scraper.py:64-72)
  test("resolution from /w/h/ path") {
    assert(UrlFunctions.parseResolution("https://a.com/640/400/x.jpg") == (640, 400))
  }
  test("resolution from -WxH suffix; no leading-zero widths") {
    assert(UrlFunctions.parseResolution("https://a.com/i-1280x800.jpg") == (1280, 800))
    assert(UrlFunctions.parseResolution("https://a.com/i-020x300.jpg") == (0, 0))
    assert(UrlFunctions.parseResolution("https://a.com/plain.jpg") == (0, 0))
  }

  // ----------------------------------------- srcset (scraper.py:216-227)
  test("srcset parse + best pick: first maximal wins (python max)") {
    // no space after comma: clean parse, highest descriptor wins, first
    // maximal on ties (python max keeps the first)
    val clean = UrlFunctions.parseSrcset("a.jpg 640w,b.jpg 1280w,c.jpg 1280w")
    assert(UrlFunctions.pickBest(clean).contains("b.jpg"))
    // reference quirk (scraper.py:217): ", "-separated entries split on the
    // LEADING space too, so later entries parse as url="" with the real url
    // in the descriptor slot (score 1) — the first entry wins
    val quirky = UrlFunctions.parseSrcset("a.jpg 640w, b.jpg 1280w")
    assert(quirky(1)._1 == "")
    assert(UrlFunctions.pickBest(quirky).contains("a.jpg"))
    assert(UrlFunctions.pickBest(UrlFunctions.parseSrcset("solo.jpg")).contains("solo.jpg"))
  }
  test("descriptor score: leading int of (\\d+)(w|x) else 1") {
    assert(UrlFunctions.descriptorScore("2x") == 2)
    assert(UrlFunctions.descriptorScore("640w") == 640)
    assert(UrlFunctions.descriptorScore("huge") == 1)
  }

  // ------------------------------------------------- urljoin (python parity)
  test("urljoin resolves absolute, root-relative and relative refs") {
    assert(UrlFunctions.urljoin("https://h.com/a/b.html", "https://x.com/c") == "https://x.com/c")
    assert(UrlFunctions.urljoin("https://h.com/a/b.html", "/img/p.jpg") == "https://h.com/img/p.jpg")
    assert(UrlFunctions.urljoin("https://h.com/a/b.html", "img/p.jpg") == "https://h.com/a/img/p.jpg")
    assert(UrlFunctions.urljoin("https://h.com/a/b.html", "//cdn.com/p.jpg") == "https://cdn.com/p.jpg")
  }

  // ------------------------------------------- PDF heuristic (scraper.py:75-97)
  test("pdf heuristic truth table") {
    assert(Predicates.isLikelyPdfUrl("https://a.com/files/doc1.pdf"))
    assert(Predicates.isLikelyPdfUrl("https://a.com/x?format=pdf"))
    assert(Predicates.isLikelyPdfUrl("https://a.com/getpdfnow/x"))
    assert(Predicates.isLikelyPdfUrl("https://a.com/download/item3"))
    assert(Predicates.isLikelyPdfUrl("https://a.com/attachment/9"))
    assert(!Predicates.isLikelyPdfUrl("https://a.com/wiki/page1.html"))
    // 'file' needs word boundary: 'files' does NOT match \bfile\b but
    // '/files/doc.pdf' matches case 1 anyway
    assert(!Predicates.isLikelyPdfUrl("https://a.com/profiles/p1.html"))
  }

  // ------------------------------------- image validator (helper_classes.py:182-222)
  test("image validator truth table") {
    assert(Predicates.isValidImageUrl("https://h.com/anything/x.JPG".toLowerCase))
    assert(Predicates.isValidImageUrl("https://h.com/assets/x.webp"))
    assert(!Predicates.isValidImageUrl("https://x.doubleclick.net/img/banner1.jpg"))
    // ad-domain regex anchors on a leading dot: subdomains of the ad domain
    // match, the bare domain itself does not (reference regex shape)
    assert(!Predicates.isValidImageUrl("https://foo.ads.pinterest.com/media/x.png"))
    // good path word, no good extension → accepted unless bad path word
    assert(Predicates.isValidImageUrl("https://h.com/640/400/upload/pic3"))
    assert(Predicates.isValidImageUrl("https://h.com/wp-content/thing"))
    assert(!Predicates.isValidImageUrl("https://h.com/images/placeholder7.foo"))
    assert(!Predicates.isValidImageUrl("https://h.com/media/icon.svg"))
    assert(!Predicates.isValidImageUrl("https://h.com/assets/style1.bar")) // no good word
    assert(!Predicates.isValidImageUrl(""))
  }

  // --------------------------------------------- relevance (2-of-3 vote)
  test("relevance: 2-of-3 fields must mention a variant, word-bounded") {
    assert(Predicates.isRelevant("Singapore skyline", "https://a.com/sg/page", "nothing"))
    assert(!Predicates.isRelevant("Singapore skyline", "https://a.com/x", "nothing"))
    assert(!Predicates.isRelevant("sgx-like", "https://a.com/x", "no")) // no word boundary match
    assert(Predicates.isRelevant("about singapore", "https://a.com", "visit sg now"))
  }

  test("normalizeText collapses whitespace and lowers (helper_classes.py:13-16)") {
    assert(Predicates.normalizeText("  A  \t B\nC ") == "a b c")
  }
}
