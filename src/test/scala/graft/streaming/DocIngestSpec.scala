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

    // statePartitions exercises the newSession state-sizing path: the
    // stream (and its foreachBatch commits) run on a child session whose
    // shuffle width differs from the test session's (which uses 4 — a
    // matching value here would pass even if the child conf were ignored)
    val q = DocIngest.ingest(spark, srcDir, table, ckpt, statePartitions = Some(3))
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

  test("replayed micro-batch is a no-op (foreachBatch at-least-once -> exactly-once commit)") {
    val store = SnapshotStore(Files.createTempDirectory("graft-ingest-replay").toString)
    val table = store.table("clean_documents")
    val batch = spark.read.parquet(srcDir)
      .withColumn("content_hash", org.apache.spark.sql.functions.xxhash64($"text"))
      .limit(10)

    DocIngest.commitBatch(table, batch, batchId = 0L)
    val afterFirst = table.currentSnapshot.get
    // crash-between-append-and-checkpoint => Spark re-invokes with the SAME batchId
    DocIngest.commitBatch(table, batch, batchId = 0L)
    val afterReplay = table.currentSnapshot.get
    assert(afterReplay.snapshotId == afterFirst.snapshotId, "replay must not commit a new snapshot")
    assert(afterReplay.rowCount == afterFirst.rowCount, "replay must not duplicate rows")
    // the NEXT batch still lands
    DocIngest.commitBatch(table, batch, batchId = 1L)
    assert(table.currentSnapshot.exists(_.generation == 2))
  }

  test("out-of-order files lose NOTHING; the only divergence is cross-horizon duplicate re-emit") {
    // a 60-word text that passes every Gopher gate, unique per doc id
    def passingText(i: Int): String =
      (s"doc$i " + Seq.tabulate(59)(j => if (j % 7 == 0) "the" else if (j % 11 == 0) "and" else s"word$j").mkString(" "))
    val d = Files.createTempDirectory("graft-ingest-ooo")
    def writeOne(sub: String, rows: Seq[(Long, String, String, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(d.resolve(sub).toString)
    // file A: LARGE doc_ids (virtual times ~1e10 ms) — watermark jumps ahead
    writeOne("a", (0 until 5).map(i => (10_000_000_000L + i, passingText(i), "en", "synth", 300L)))
    // file B: tiny doc_ids — every row arrives far BELOW A's watermark
    // ("late"); pins the no-loss half
    writeOne("b", (5 until 10).map(i => (i.toLong, passingText(i), "en", "synth", 300L)))
    // file C: unique docs 2×delay past A — advances the watermark beyond
    // A's state-expiry horizon (event + delay), evicting A's dedup state
    writeOne("c", (10 until 12).map(i => (10_008_000_000L + i, passingText(i), "en", "synth", 300L)))
    // file C2: a spacer batch — state eviction runs in the state-commit
    // phase AFTER a batch's rows are matched, so the advanced watermark
    // only evicts A's entries once a further batch commits
    writeOne("c2", Seq((10_008_000_050L, passingText(12), "en", "synth", 300L)))
    // file D: a DUPLICATE of doc 0's text with a fresh virtual time,
    // arriving after A's state was evicted — pins the re-emit half
    writeOne("d", Seq((10_008_000_100L, passingText(0), "en", "synth", 300L)))
    // stage as a flat dir with strictly increasing mod times: A, B, C, C2, D
    val src = Files.createTempDirectory("graft-ingest-ooo-src")
    def firstParquet(dir: java.nio.file.Path): java.nio.file.Path = {
      val s = Files.list(dir)
      try s.filter(_.toString.endsWith(".parquet")).findFirst().get() finally s.close()
    }
    Seq("a", "b", "c", "c2", "d").zipWithIndex.foreach { case (sub, i) =>
      val f = src.resolve(s"$i-$sub.parquet")
      Files.copy(firstParquet(d.resolve(sub)), f)
      Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(1_000_000L * (i + 1)))
    }

    val store = SnapshotStore(Files.createTempDirectory("graft-ingest-ooo-out").toString)
    val table = store.table("clean_documents")
    val ckpt = Files.createTempDirectory("graft-ingest-ooo-ckpt").toString
    val q = DocIngest.ingest(spark, src.toString, table, ckpt)
    q.awaitTermination(120000)

    val streamed = table.read(spark).getOrElse(fail("no data ingested"))
    assert(table.currentSnapshot.exists(_.generation >= 5), "fixture must span multiple micro-batches")
    // NO data loss: dropDuplicatesWithinWatermark never filters late rows
    // (the watermark bounds state, not input) — docs 5..9 arrive with event
    // times far below A's watermark in a LATER micro-batch and still land
    val keptIds = streamed.select($"doc_id").as[Long].collect().toSet
    val expectedUniques = ((0 until 5).map(i => 10_000_000_000L + i) ++
      (5 until 10).map(_.toLong) ++ (10 until 12).map(i => 10_008_000_000L + i) ++
      Seq(10_008_000_050L)).toSet
    assert(expectedUniques.subsetOf(keptIds),
      s"every unique doc must survive out-of-order arrival, got $keptIds")
    // the ONE divergence: the cross-horizon duplicate is re-emitted by the
    // stream (state for doc 0's hash was evicted) and removed by the exact
    // batch dedup — duplicate re-emit, never loss
    assert(keptIds.contains(10_008_000_100L), "cross-horizon duplicate should be re-emitted")
    val batch = DocIngest.batchEquivalent(spark, src.toString)
    assert(batch.count() == 13)
    assert(streamed.count() == 14)
    // the content-hash SETS still agree (re-emit adds a copy, not a new hash)
    val sHashes = streamed.select($"content_hash").as[Long].collect().toSet
    val bHashes = batch.select($"content_hash").as[Long].collect().toSet
    assert(sHashes == bHashes)
  }
}
