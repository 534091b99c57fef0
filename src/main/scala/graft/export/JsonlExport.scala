package graft.`export`

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's export surface (F6/F7), re-expressed as a distributed
  * write: per-run JSONL files holding exactly the reference record shapes,
  * with ISO timestamps rendered by `date_format` AT EXPORT ONLY — the
  * engine's internal tables stay timestamp-free (logical `generation`
  * columns), preserving determinism; the caller supplies one `runTsMicros`
  * per run (the engine's normalization of the reference's per-record
  * `datetime.utcnow()` calls, crawler.py:194, scraper.py:266,285).
  *
  * Record shapes (field order = reference dict order, nulls kept):
  *  - link record (crawler.py:190-204): title, href, content, stored_at
  *    (naive isoformat, microseconds, no suffix), original_query, page,
  *    engine — image hits additionally carry type/img_src/thumbnail_src
  *    (general hits omit the keys entirely, like the python dict does)
  *  - image record (scraper.py:258-267): image_url, page_url, page_title,
  *    alt_text, title_attribute, raw_caption, page_summary, extracted_at —
  *    the reference's `isoformat() + "Z"` on an aware datetime yields the
  *    doubled suffix `+00:00Z`; preserved verbatim (quirk tests pin it)
  *  - markdown record (scraper.py:279-286): page_url, page_title,
  *    page_summary, text_content, extracted_at (same +00:00Z quirk)
  *
  * File naming follows the reference: `{prefix}_links_{yyyyMMdd_HHmmss}.jsonl`
  * (crawler.py:45-47), `images_metadata_{ts}` / `text_markdown_{ts}`
  * (main.py:86-88) — but each "file" is a directory of part files written in
  * parallel: at 100 TB a single-handle JSON-array dump (main.py:91-94) is the
  * bottleneck; JSONL parts shard the write across executors and remain
  * line-compatible consumers-side.
  */
object JsonlExport {

  /** Naive `datetime.utcnow().isoformat()`: microsecond precision, no zone. */
  def isoNaive(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** `datetime.now(timezone.utc).isoformat() + "Z"` — reference quirk: the
    * aware isoformat already ends in +00:00, so the literal Z doubles up.
    */
  def isoAwarePlusZ(ts: Column): Column =
    concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("+00:00Z"))

  /** Run-file timestamp component (crawler.py:45): yyyyMMdd_HHmmss UTC. */
  def runFileTs(ts: Column): Column = date_format(ts, "yyyyMMdd_HHmmss")

  private def jsonOpts = Map("ignoreNullFields" -> "false")

  private def tsCol(runTsMicros: Long): Column =
    timestamp_micros(lit(runTsMicros))

  /** Link rows → JSON line column, ordered by ArrivalKey. General and image
    * hits render from different structs so general records omit the image
    * keys entirely (python dict semantics, crawler.py:199-204).
    */
  def linkRecords(links: DataFrame, runTsMicros: Long): DataFrame = {
    val ts = isoNaive(tsCol(runTsMicros))
    val base = Seq(col("title"), col("href"), col("content"),
      ts.as("stored_at"), col("original_query"), col("page"), col("engine"))
    val imageExtra = Seq(col("type"), col("img_src"), col("thumbnail_src"))
    val line = when(col("kind") === 1,
      to_json(struct(base ++ imageExtra: _*), jsonOpts.asJava))
      .otherwise(to_json(struct(base: _*), jsonOpts.asJava))
    links
      .withColumn("line", line)
      .sortWithinPartitions(col("round"), col("kind"), col("query_rank"), col("page"), col("result_rank"))
  }

  /** Image-metadata rows → JSON line column (scraper.py:258-267). */
  def imageRecords(images: DataFrame, runTsMicros: Long): DataFrame =
    images.withColumn("line", to_json(struct(
      col("image_url"), col("page_url"), col("page_title"), col("alt_text"),
      col("title_attribute"), col("raw_caption"), col("page_summary"),
      isoAwarePlusZ(tsCol(runTsMicros)).as("extracted_at")), jsonOpts.asJava))
      .sortWithinPartitions(col("generation"), col("page_url"), col("image_url"))

  /** Markdown rows → JSON line column (scraper.py:279-286). text_content is
    * the rendered markdown of the span sequence (F9).
    */
  def markdownRecords(docs: DataFrame, runTsMicros: Long): DataFrame =
    docs.withColumn("line", to_json(struct(
      col("page_url"), col("page_title"), col("page_summary"),
      col("text_content"), isoAwarePlusZ(tsCol(runTsMicros)).as("extracted_at")), jsonOpts.asJava))
      .sortWithinPartitions(col("generation"), col("page_url"))

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }

  /** Write one run's exports under `outDir` with reference-shaped names.
    * Returns the written directory paths (each a parquet-style part dir of
    * JSONL lines).
    */
  def writeRun(spark: SparkSession, outDir: String, prefix: String, runTsMicros: Long,
               links: DataFrame, images: DataFrame, docs: DataFrame): Seq[String] = {
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.EPOCH.plusNanos(runTsMicros * 1000L))
    val targets = Seq(
      (linkRecords(links, runTsMicros), s"$outDir/${prefix}_links_$ts.jsonl"),
      (imageRecords(images, runTsMicros), s"$outDir/images_metadata_$ts.jsonl"),
      (markdownRecords(docs, runTsMicros), s"$outDir/text_markdown_$ts.jsonl"))
    targets.map { case (df, path) =>
      df.select(col("line")).write.mode("overwrite").text(path)
      path
    }
  }
}
