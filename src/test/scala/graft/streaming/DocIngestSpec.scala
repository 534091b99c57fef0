package graft.streaming

import graft.SparkTestSession
import graft.snapshot.SnapshotStore
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class DocIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the file stream source needs a DIRECTORY; the fixture table is a single
  // parquet file — stage it into a temp dir (read-only testdata untouched)
  private lazy val srcDir: String = {
    val d = Files.createTempDirectory("graft-ingest-src")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      d.resolve("documents-part0.parquet"))
    d.toString
  }

  test("streaming ingest equals the batch clean (dedup hash set + gate verdicts), committed per micro-batch") {
    val store = SnapshotStore(Files.createTempDirectory("graft-ingest").toString)
    val table = store.table("clean_documents")
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString

    val q = DocIngest.ingest(spark, srcDir, table, ckpt)
    q.awaitTermination(120000)

    val streamed = table.read(spark).getOrElse(fail("no data ingested"))
    val batch = DocIngest.batchEquivalent(spark, srcDir)

    // the survivor of a duplicate group is arrival-order-dependent in the
    // stream and arbitrary in the batch dropDuplicates — compare the
    // content-hash SETS (the dedup semantics) and the row counts
    val sHashes = streamed.select($"content_hash").as[Long].collect().toSet
    val bHashes = batch.select($"content_hash").as[Long].collect().toSet
    assert(sHashes == bHashes)
    assert(streamed.count() == batch.count())
    assert(sHashes.nonEmpty, "fixture must keep some documents")

    // the gates actually shed something on this corpus (else the test is vacuous)
    assert(batch.count() < spark.read.parquet(srcDir).count())

    // every kept row passes the gates (streaming side applied them too)
    val g = graft.ml.TextAnalysis.gopherGates(org.apache.spark.sql.functions.col("text"))
    assert(streamed.withColumn("keep", g.getField("keep"))
      .filter(!org.apache.spark.sql.functions.col("keep")).count() == 0)

    // snapshot semantics: the commit is generation-stamped and readable
    // mid-stream like any engine table
    assert(table.currentSnapshot.exists(_.generation >= 1))
  }
}
