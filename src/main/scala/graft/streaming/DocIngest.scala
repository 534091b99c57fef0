package graft.streaming

import graft.ml.TextAnalysis
import graft.snapshot.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming training-data ingest: the streaming form of the batch cleaning
  * pipeline. A documents directory is tailed as a file-source stream and
  * each micro-batch flows through
  *
  *  1. content-hash dedup with watermark-bounded state
  *     (`dropDuplicatesWithinWatermark` on xxhash64(text) — the state store
  *     holds only the horizon's hashes, viable on an unbounded feed; an
  *     exact batch dedup over the lakehouse table remains the authority for
  *     cross-horizon duplicates, mirroring the crawl engine's
  *     streaming-tier / exact-tier split),
  *  2. the Gopher hard quality gates ([[TextAnalysis.gopherGates]] — word
  *     band, mean-word-length band, symbol ratio, stopword evidence),
  *  3. an atomic snapshot-table append per micro-batch via `foreachBatch`
  *     (generation = batch id + 1), so the ingested table carries the same
  *     commit/rollback/time-travel semantics as every other engine table
  *     and downstream batch jobs can consume it mid-stream.
  *
  * Documents carry no wall-clock timestamp (determinism rule) — virtual
  * event time is derived from doc_id, exactly like the fetch-event stream's
  * scheduled_ms clock.
  *
  * ==Ordering contract (load-bearing, spec-pinned)==
  * The virtual clock makes the watermark a function of the LARGEST doc_id
  * seen so far, while the file source orders micro-batches by file path /
  * modification time, NOT by doc_id. `dropDuplicatesWithinWatermark` never
  * filters rows by lateness — the watermark only bounds its STATE — so
  * out-of-order files cause NO data loss relative to [[batchEquivalent]].
  * The one divergence direction is the documented duplicate re-emit: a
  * duplicate arriving after the watermark evicted its key's state (more
  * than 2× the delay past the original on the virtual clock) passes
  * through as a second copy, which the authoritative exact batch dedup
  * later removes. DocIngestSpec pins both halves with an out-of-order
  * three-file fixture (late uniques survive; a cross-horizon duplicate is
  * re-emitted). Feeding files monotone in doc_id (the crawl exporter's
  * generation-stamped files are) keeps even that window closed.
  */
object DocIngest {

  /** The cleaning transform shared verbatim by the stream and its batch
    * oracle (minus the dedup, whose streaming form is watermark-bounded).
    */
  private def gated(df: DataFrame): DataFrame = {
    val g = TextAnalysis.gopherGates(col("text"))
    df.withColumn("keep", g.getField("keep"))
      .filter(col("keep")).drop("keep")
  }

  /** Build the cleaned stream: dedup (watermark-bounded) + quality gates.
    * Exposed separately from [[ingest]] so tests can also sink it to memory.
    *
    * `statePartitions` sizes the dedup operator's state-store count — a
    * per-query deployment choice (the checkpoint pins it for the query's
    * lifetime), decoupled from the batch session's shuffle width via
    * `newSession()` (shared SparkContext, own SQLConf). Size it to the
    * horizon's expected key cardinality: each partition is one state store
    * whose per-batch delta/snapshot files dominate wall time when the
    * micro-batch is small, and whose memory bounds the partition's share of
    * keys when it is not.
    */
  def cleanedStream(spark: SparkSession, srcDir: String,
                    watermark: String = "1 hour",
                    maxFilesPerTrigger: Int = 1,
                    statePartitions: Option[Int] = None): DataFrame = {
    val session = statePartitions.fold(spark) { n =>
      val ss = spark.newSession()
      // newSession() starts from builder/context-level conf only — copy the
      // caller's RUNTIME SQL conf too (a session tuned via spark.conf.set
      // must not silently lose those settings on the statePartitions path);
      // non-settable entries are skipped
      spark.conf.getAll.foreach { case (k, v) =>
        try ss.conf.set(k, v) catch { case _: Exception => () }
      }
      ss.conf.set("spark.sql.shuffle.partitions", n.toString)
      ss
    }
    val schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    val raw = session.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
    gated(
      raw.withColumn("content_hash", xxhash64(col("text")))
        .withColumn("event_time", timestamp_millis(col("doc_id")))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark("content_hash"))
      .drop("event_time")
  }

  /** The batch oracle of [[cleanedStream]] over the same directory: exact
    * dedup by content hash (first-arrival winner is arbitrary either way —
    * compare hash SETS, not survivor ids) + the same gates.
    */
  def batchEquivalent(spark: SparkSession, srcDir: String): DataFrame =
    gated(spark.read.parquet(srcDir)
      .withColumn("content_hash", xxhash64(col("text")))
      .dropDuplicates("content_hash"))

  /** Start the ingest: every micro-batch appends atomically to `table`.
    * AvailableNow by default (drain-what-exists, then stop — the
    * backfill/test trigger); pass a processing-time trigger for a live tail.
    */
  def ingest(spark: SparkSession, srcDir: String, table: SnapshotTable,
             checkpointDir: String, watermark: String = "1 hour",
             trigger: Trigger = Trigger.AvailableNow(),
             statePartitions: Option[Int] = None): StreamingQuery =
    cleanedStream(spark, srcDir, watermark, statePartitions = statePartitions)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(table, batch, batchId)
      }
      .start()

  /** One atomic snapshot commit per micro-batch; the generation stamp makes
    * stream progress rollback-addressable like any engine table.
    * foreachBatch is at-least-once: after a crash between the append and the
    * streaming checkpoint commit, Spark REPLAYS the batch — the generation
    * guard makes the replayed append a no-op instead of a duplicate commit
    * (the standard exactly-once foreachBatch pattern, possible here because
    * generations are monotone in batch id). Package-visible so the replay
    * no-op is directly testable.
    */
  private[streaming] def commitBatch(table: SnapshotTable, batch: DataFrame, batchId: Long): Unit = {
    val gen = batchId.toInt + 1
    if (!table.currentSnapshot.exists(_.generation >= gen))
      table.append(batch, generation = gen)
    ()
  }
}
