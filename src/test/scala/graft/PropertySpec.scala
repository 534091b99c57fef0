package graft

import graft.functions.{Predicates, SpanExtractor, UrlFunctions}
import graft.operators.{BlockedBloom, CuckooFilter}
import graft.synth.{SyntheticWeb, WebConfig}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.4) using ScalaCheck generators with
  * a deterministic seeded sampler (the scalatestplus bridge isn't in the
  * offline cache; deterministic sampling is what we want anyway — failures
  * reproduce). The scala-vs-Column parity properties are load-bearing: the
  * sequential oracle evaluates the pure Scala predicates while the engine
  * evaluates the Catalyst Column forms — any divergence silently breaks
  * oracle equality.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampler: n samples from g, seeds 0..n-1. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAllSampled[A](g: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    val xs = samples(g, n)
    assert(xs.size >= n / 2, "generator must produce samples")
    xs.foreach(body)
  }

  // URL generator spanning the synthetic web's shapes plus adversarial junk
  private val genUrl: Gen[String] = {
    val cfg = WebConfig(seed = 7, nHosts = 50)
    val pageUrls = for {
      r <- Gen.choose(1, 50); p <- Gen.choose(0L, 500L)
    } yield SyntheticWeb.pageUrl(cfg, r, p)
    val imgUrls = for {
      r <- Gen.choose(1, 50); h <- Gen.long
    } yield SyntheticWeb.imageUrl(cfg, r, h)
    val weird = Gen.oneOf(
      "https://h.com/a/b?w=1&h=2#f", "https://H.COM/640/400/x.png/",
      "https://h.com/i-1280x800.jpg?width=640", "relative/path.jpg",
      "/rooted/img.png", "//proto.rel/x.gif", "https://h.com",
      "https://h.com/?q=pdf", "https://h.com/a%20b/c.pdf")
    Gen.frequency(4 -> pageUrls, 4 -> imgUrls, 2 -> weird)
  }

  test("bloom never forgets an inserted key (no false negatives), ever") {
    forAllSampled(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), 100) { keys =>
      val b = BlockedBloom.sized(math.max(64, keys.size.toLong))
      keys.foreach(b.add)
      assert(keys.forall(b.mightContain))
    }
  }

  test("cuckoo: unsaturated negatives are exact; delete removes") {
    forAllSampled(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), 100) { keys0 =>
      val keys = keys0.distinct
      val cf = CuckooFilter.sized(math.max(64, keys.size.toLong * 2))
      keys.foreach(cf.insert)
      assert(keys.forall(cf.contains))
      if (cf.negativesAreExact) {
        keys.headOption.foreach { k =>
          cf.delete(k)
          assert(!cf.contains(k) || keys.count(_ == k) > 1)
        }
      }
    }
  }

  test("span extraction is deterministic and well-formed on every generated page") {
    val cfg = WebConfig(seed = 11, nHosts = 30)
    forAllSampled(Gen.zip(Gen.choose(1, 30), Gen.choose(0L, 200L)), 200) { case (r, p) =>
      val url = SyntheticWeb.pageUrl(cfg, r, p)
      val html = SyntheticWeb.pageHtml(cfg, url)
      val e1 = SpanExtractor.extract(url, html)
      val e2 = SpanExtractor.extract(url, html)
      assert(e1.spans == e2.spans)
      assert(e1.spans.map(_.offset) == e1.spans.indices.toVector, "offsets contiguous")
      val kinds = Set("title", "meta", "heading", "para", "list_item", "quote", "image")
      assert(e1.spans.forall(s => kinds(s.kind)))
      assert(e1.spans.forall(s => (s.media_ref != null) == (s.kind == "image")))
      e1.spans.filter(_.kind == "image").foreach(s =>
        assert(Predicates.isValidImageUrl(s.media_ref)))
      // paragraph filter honored (helper_classes.py:146)
      assert(e1.spans.filter(_.kind == "para").forall(_.text.length > 20))
    }
  }

  test("politeness schedule property: per-host spacing >= min_delay under any seeds/batch") {
    forAllSampled(Gen.zip(Gen.choose(1L, 1000L), Gen.choose(2, 7), Gen.choose(3, 15)), 25) {
      case (seed, batch, nq) =>
        val cfg = WebConfig(seed = seed, nHosts = 20)
        val res = graft.oracle.SequentialOracle.run(cfg,
          (1 to nq).map(i => s"singapore q$i"), batch)
        res.fetchEvents.groupBy(_.host).foreach { case (_, evs) =>
          val ts = evs.map(_.scheduled_ms).sorted
          ts.sliding(2).foreach {
            case Seq(a, b) => assert(b - a >= evs.head.min_delay_ms)
            case _ => ()
          }
        }
    }
  }

  // ------------- scala-vs-Column parity (oracle vs engine forms) ----------
  lazy val spark = SparkTestSession.spark

  private def parityCheck(urls: Seq[String],
                          scalaF: String => Any,
                          colF: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    val df = urls.toDF("url").select(col("url"), colF(col("url")).as("got"))
    val rows = df.collect()
    rows.foreach { r =>
      val url = r.getString(0)
      val want = scalaF(url)
      val got = r.get(1)
      assert(got == want, s"parity mismatch on $url: column=$got scala=$want")
    }
  }

  test("Column forms equal pure-Scala forms on 500 sampled URLs") {
    val urls = samples(genUrl, 500)
      .filter(_.startsWith("http")) // Column forms are specified for absolute URLs
    parityCheck(urls, Predicates.isLikelyPdfUrl, Predicates.isLikelyPdfUrlCol)
    parityCheck(urls, Predicates.isValidImageUrl, Predicates.isValidImageUrlCol)
    parityCheck(urls, u => UrlFunctions.canonicaliseUrl(u), UrlFunctions.canonicaliseUrlCol)
    parityCheck(urls, u => { val (w, h) = UrlFunctions.parseResolution(u); w.toLong * h },
      UrlFunctions.resolutionAreaCol)
  }

  test("relevance Column form equals scala form on synthetic hits") {
    import spark.implicits._
    val cfg = WebConfig(seed = 3, nHosts = 40)
    val hits = (1 to 50).flatMap(i =>
      SyntheticWeb.searchHits(cfg, s"singapore q$i", 1, isImage = i % 2 == 0))
    val df = hits.map(h => (h.title, h.url, h.content)).toDF("title", "href", "content")
      .select(col("title"), col("href"), col("content"),
        Predicates.isRelevantCol(col("title"), col("href"), col("content")).as("got"))
    df.collect().foreach { r =>
      assert(r.getBoolean(3) == Predicates.isRelevant(r.getString(0), r.getString(1), r.getString(2)))
    }
  }
}
