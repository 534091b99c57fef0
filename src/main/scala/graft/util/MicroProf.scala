package graft.util

import graft.synth.{SyntheticWeb, WebConfig}

/** Single-threaded micro-profiler for the per-page hot path (fetch = HTML
  * synthesis, parse = DOM build, extract = span extraction) — the loop that
  * dominates generation compute. Run:
  * {{{ runMain graft.util.MicroProf [nPages] [bodyElems] }}}
  * Times are per-phase totals over the same page set; JIT-warmed.
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val bodyElems = args.lift(1).map(_.toInt).getOrElse(150)
    val cfg = WebConfig(seed = 42, nHosts = 50000, bodyElems = bodyElems)
    val urls = (0 until n).map { i =>
      SyntheticWeb.pageUrl(cfg, 1 + i % 5000, i.toLong)
    }.toArray

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-10s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (${(System.nanoTime() - t0) / 1e3 / n}%6.1f us/page)")
      r
    }

    (0 until 2).foreach { round =>
      if (round == 1) println(s"--- warm ($n pages, bodyElems=$bodyElems) ---")
      // keep (url, html) PAIRED through the flatMap — fetch misses (default
      // 4%) would otherwise misalign every page after the first miss
      val pages = time("fetch") {
        urls.flatMap(u => SyntheticWeb.fetch(cfg, u).map(h => (u, h)))
      }
      val docs = time("parse") {
        pages.map { case (_, h) => graft.functions.HtmlDom.parse(h) }
      }
      time("extract") {
        var spans = 0L
        pages.foreach { case (u, h) =>
          spans += graft.functions.SpanExtractor.extract(u, h).spans.size
        }
        if (round == 1) println(s"  pages=${pages.length} spans=$spans htmlBytes=${pages.map(_._2.length.toLong).sum}")
        spans
      }
      docs.length
    }
  }
}
