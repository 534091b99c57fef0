package graft.`export`

import graft.SparkTestSession
import graft.model.Link
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file tests for the JSONL export surface: byte-exact reference
  * record shapes (field order, null handling, the +00:00Z quirk) under a
  * fixed run timestamp.
  */
class ExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2026-01-02T03:04:05.123456Z
  private val runTs = java.time.Instant.parse("2026-01-02T03:04:05.123456Z")
  private val runTsMicros = runTs.getEpochSecond * 1000000L + 123456L

  test("link records: reference dict shape, image keys only for image hits") {
    val links = Seq(
      Link("T", "http://a/x", "C", "q1", 1, "ddg", None, None, None, 1, 0, 0, 0, "a"),
      Link("I", "http://a/i", "", "q1", 1, "img", Some("image"),
        Some("http://a/i.jpg"), None, 1, 0, 1, 0, "a")).toDF()
    val got = JsonlExport.linkRecords(links, runTsMicros)
      .orderBy($"kind").select($"line").as[String].collect().toSeq
    assert(got == Seq(
      """{"title":"T","href":"http://a/x","content":"C","stored_at":"2026-01-02T03:04:05.123456","original_query":"q1","page":1,"engine":"ddg"}""",
      """{"title":"I","href":"http://a/i","content":"","stored_at":"2026-01-02T03:04:05.123456","original_query":"q1","page":1,"engine":"img","type":"image","img_src":"http://a/i.jpg","thumbnail_src":null}"""))
  }

  test("image + markdown records carry the +00:00Z quirk timestamp") {
    val images = Seq(("u", "p", "t", "a", "ti", "rc", "ps", 1))
      .toDF("image_url", "page_url", "page_title", "alt_text",
        "title_attribute", "raw_caption", "page_summary", "generation")
    val gotImg = JsonlExport.imageRecords(images, runTsMicros)
      .select($"line").as[String].head()
    assert(gotImg ==
      """{"image_url":"u","page_url":"p","page_title":"t","alt_text":"a","title_attribute":"ti","raw_caption":"rc","page_summary":"ps","extracted_at":"2026-01-02T03:04:05.123456+00:00Z"}""")

    val docs = Seq(("p", "t", "ps", "# T\ncontent", 1))
      .toDF("page_url", "page_title", "page_summary", "text_content", "generation")
    val gotMd = JsonlExport.markdownRecords(docs, runTsMicros)
      .select($"line").as[String].head()
    assert(gotMd ==
      """{"page_url":"p","page_title":"t","page_summary":"ps","text_content":"# T\ncontent","extracted_at":"2026-01-02T03:04:05.123456+00:00Z"}""")
  }

  test("writeRun uses reference file naming with the run-ts component") {
    val links = Seq(Link("T", "http://a/x", "C", "q1", 1, "ddg",
      None, None, None, 1, 0, 0, 0, "a")).toDF()
    val images = Seq(("u", "p", "t", "a", "ti", "rc", "ps", 1))
      .toDF("image_url", "page_url", "page_title", "alt_text",
        "title_attribute", "raw_caption", "page_summary", "generation")
    val docs = Seq(("p", "t", "ps", "md", 1))
      .toDF("page_url", "page_title", "page_summary", "text_content", "generation")
    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    val paths = JsonlExport.writeRun(spark, out, "run", runTsMicros, links, images, docs)
    assert(paths == Seq(
      s"$out/run_links_20260102_030405.jsonl",
      s"$out/images_metadata_20260102_030405.jsonl",
      s"$out/text_markdown_20260102_030405.jsonl"))
    val lines = spark.read.text(paths.head).count()
    assert(lines == 1)
  }
}
