package graft.model

/** Core data model of the crawl engine.
  *
  * Mirrors the reference's implicit record shapes (all citations into
  * /root/reference/):
  *  - [[Span]] / [[Doc]]: the interleaved text+media document produced by the
  *    ordered DOM extraction (app/utils/helper_classes.py:113-177 for text,
  *    app/core/scraper.py:290-319 for images). This is exactly the
  *    BASELINE.json input_hint schema:
  *    `doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>`.
  *  - [[Link]]: the master/run JSONL link record (app/core/crawler.py:190-204)
  *    plus engine-side determinism columns (arrival key, host) that replace
  *    the reference's thread-arrival nondeterminism.
  *  - [[SearchHit]]: the SearXNG result shape consumed at
  *    app/core/crawler.py:100-107,180-204.
  *  - [[HostProfile]]: synthetic-web host universe (no reference analogue;
  *    parameterizes the north rule's power-law frontier + politeness budget).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

object SpanKind {
  val Title = "title"
  val Meta = "meta"
  val Heading = "heading"
  val Para = "para"
  val ListItem = "list_item"
  val Quote = "quote"
  val Image = "image"
}

/** The input_hint document row. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** Full extracted page row as the engine persists it (doc_id + provenance). */
final case class PageDoc(
    doc_id: String,
    page_url: String,
    page_title: String,
    page_summary: String,
    spans: Seq[Span],
    generation: Int)

/** Deterministic total order on crawl arrivals. Replaces the reference's
  * thread-completion order (crawler.py:269 `as_completed`) with a pure
  * data-derived key: (generation round, rank of query in the seeded batch
  * schedule, search kind (general=0/image=1), page number, rank of hit within
  * the result page).
  */
final case class ArrivalKey(round: Int, queryRank: Int, kind: Int, page: Int, resultRank: Int)

/** One SearXNG-shaped search result (crawler.py:100-107). */
final case class SearchHit(
    url: String,
    title: String,
    content: String,
    engine: String,
    img_src: Option[String],
    thumbnail_src: Option[String])

/** Master-link record (crawler.py:190-204) + engine determinism columns. */
final case class Link(
    title: String,
    href: String,
    content: String,
    original_query: String,
    page: Int,
    engine: String,
    `type`: Option[String],
    img_src: Option[String],
    thumbnail_src: Option[String],
    round: Int,
    query_rank: Int,
    kind: Int,
    result_rank: Int,
    host: String)

/** Synthetic web host universe entry. */
final case class HostProfile(
    host: String,
    zipf_rank: Long,
    min_delay_ms: Long,
    robots_disallow: Seq[String],
    page_count: Long)

/** Per-host fetch event emitted by the politeness scheduler; virtual-clock
  * timestamps make the politeness invariant (consecutive fetches on a host
  * >= min_delay) testable without wall time. phase: 0 = search-driven,
  * 1 = frontier expansion (link-driven).
  */
final case class FetchEvent(
    url: String,
    host: String,
    salt: Int,
    scheduled_ms: Long,
    min_delay_ms: Long,
    round: Int,
    phase: Int)

/** Priority-frontier row: a link discovered on a fetched page, awaiting a
  * per-host top-k pick (north rule: host-hash partitioned, score-ordered).
  */
final case class FrontierLink(url: String, host: String, score: Double, discovered_gen: Int)

/** Per-generation, per-partition lineage + counters (north rule). */
final case class PartitionMetrics(
    generation: Int,
    partition_id: Int,
    urls_in: Long,
    urls_deduped: Long,
    urls_fetched: Long,
    docs_emitted: Long,
    spans_emitted: Long)
