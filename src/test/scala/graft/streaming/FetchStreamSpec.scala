package graft.streaming

import graft.SparkTestSession
import graft.model.FetchEvent
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class FetchStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic fetch log: 3 hosts, one with planted violations. */
  private def events: Seq[FetchEvent] =
    (0 until 40).map { i =>
      val host = s"host${i % 3}.example"
      val delay = 100L * (1 + i % 3)
      // hostN fetches every `delay+50` ms except host0 which double-fires
      val t = if (i % 3 == 0 && i % 6 == 0) (i / 3) * 150L + 10L else (i / 3) * 150L + 100L
      FetchEvent(s"https://$host/p$i", host, 0, t, delay, 1, 0)
    }

  test("streamed windowed host counts equal the batch aggregation") {
    val dir = Files.createTempDirectory("graft-stream").toString
    events.toDS().toDF().coalesce(2).write.mode("overwrite").parquet(dir)

    val stream = FetchStream.fetchEventStream(spark, dir)
    val agg = FetchStream.windowedHostCounts(stream)
    val qname = s"host_counts_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table(qname)
      .select($"window_start", $"host", $"n_fetches")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = events.toDS().toDF()
      .withColumn("event_time", timestamp_millis($"scheduled_ms"))
      .groupBy(window($"event_time", "1 minute"), $"host")
      .agg(count(lit(1)).as("n_fetches"))
      .select($"window.start".as("window_start"), $"host", $"n_fetches")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming url dedup keeps exactly the distinct url set (watermark-bounded state)") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    // plant duplicates: every event re-emitted once
    val dup = events ++ events.map(e => e.copy(scheduled_ms = e.scheduled_ms + 5))
    dup.toDS().toDF().coalesce(2).write.mode("overwrite").parquet(dir)

    val stream = FetchStream.fetchEventStream(spark, dir)
    val deduped = FetchStream.streamingSeenDedup(stream)
    val qname = s"seen_dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val urls = spark.table(qname).select($"url").as[String].collect().toSeq
    assert(urls.size == urls.distinct.size, "no url may survive twice")
    assert(urls.toSet == events.map(_.url).toSet)
  }

  test("streaming hot-host top-k equals the batch statistic on a planted skew") {
    // planted skew: one mega-host (25 events), a mid host (9), tail hosts
    // (3 each) — spread across 3 files so the cumulative state must
    // survive micro-batch boundaries to rank correctly
    val skewed: Seq[FetchEvent] =
      (0 until 25).map(i => FetchEvent(s"https://mega.example/p$i", "mega.example", 0, i * 200L, 100L, 1, 0)) ++
        (0 until 9).map(i => FetchEvent(s"https://mid.example/p$i", "mid.example", 0, i * 200L, 100L, 1, 0)) ++
        (0 until 4).flatMap(h => (0 until 3).map(i =>
          FetchEvent(s"https://tail$h.example/p$i", s"tail$h.example", 0, i * 200L, 100L, 1, 0)))
    val dir = Files.createTempDirectory("graft-stream-topk")
    skewed.grouped(17).zipWithIndex.foreach { case (chunk, i) =>
      val f = dir.resolve(s"$i")
      chunk.toDS().toDF().coalesce(1).write.parquet(f.toString)
    }
    // flatten the part files into one stream dir, preserving chunk order
    val src = Files.createTempDirectory("graft-stream-topk-src")
    (0 until 3).foreach { i =>
      val s = Files.list(dir.resolve(s"$i"))
      val part = try s.filter(_.toString.endsWith(".parquet")).findFirst().get() finally s.close()
      val f = src.resolve(f"$i%02d.parquet")
      Files.copy(part, f)
      Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(1_000_000L * (i + 1)))
    }

    val schema = org.apache.spark.sql.Encoders.product[FetchEvent].schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
      .as[FetchEvent]
    val counts = FetchStream.runningHostCounts(stream)
    val qname = s"hot_hosts_${System.nanoTime()}"
    val q = counts.toDF().writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamTopK = FetchStream.hotHostTopK(spark.table(qname), 3)
      .as[(String, Long)].collect().toSeq
    val batchTopK = skewed.toDS().toDF()
      .groupBy($"host").agg(count(lit(1)).as("n_scheduled"))
      .orderBy($"n_scheduled".desc, $"host").limit(3)
      .as[(String, Long)].collect().toSeq
    assert(streamTopK == batchTopK)
    assert(streamTopK.head == ("mega.example", 25L), s"planted skew must rank first: $streamTopK")
    // cumulative state crossed micro-batch boundaries: mega's final count
    // (25) exceeds any single file's contribution (17-row chunks)
    assert(spark.table(qname).filter($"host" === "mega.example").count() > 1,
      "mega must have emitted updates in more than one micro-batch")
  }

  test("stateful politeness audit flags exactly the planted violations") {
    val ds = events.toDS()
    val violations = FetchStream.politenessAudit(ds).collect().toSeq
    // recompute expected sequentially
    val expected = events.groupBy(_.host).toSeq.flatMap { case (h, evs) =>
      val sorted = evs.sortBy(e => (e.scheduled_ms, e.url))
      sorted.zip(sorted.drop(1)).collect {
        case (a, b) if b.scheduled_ms - a.scheduled_ms < b.min_delay_ms =>
          (h, a.scheduled_ms, b.scheduled_ms)
      }
    }.toSet
    assert(violations.map(v => (v.host, v.prev_ms, v.cur_ms)).toSet == expected)
    assert(expected.nonEmpty, "fixture must plant violations")
  }
}
