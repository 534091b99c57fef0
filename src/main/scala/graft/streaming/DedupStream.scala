package graft.streaming

import graft.ml.TextDedup
import graft.snapshot.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-duplicate detection: continuous MinHash+LSH dedup DURING
  * ingest, so a corpus never needs the daily full self-join re-dedup. Each
  * micro-batch (the delta):
  *
  *  1. near-dup pairs = [[TextDedup.minhashNearDupsIncremental]](corpus-so-
  *     far, delta): delta vs the accumulated corpus AND delta-internal,
  *     with NO corpus self-join — the corpus side pays two pushdown-
  *     friendly scans (band keys semi-joined against the delta's occupied
  *     buckets; exact-verify re-reads only candidate ids), so per-batch
  *     cost is delta-dominated;
  *  2. the pairs append, then the delta append, each guarded by its own
  *     table generation (monotone in batch id). foreachBatch is
  *     at-least-once: a crash in any of the three windows (before either
  *     append / between them / after both) replays the batch, and the
  *     guards re-run exactly the missing appends — pairs are always
  *     computed against the corpus EXCLUDING the current batch, which the
  *     append order preserves across replays.
  *
  * ==Stream == batch (exact, not approximate)==
  * The drained pairs table equals [[TextDedup.minhashNearDups]] over the
  * whole corpus, as a set: banding is a pure per-doc function (seeded,
  * doc-independent), so a pair (a, b) shares a band signature in the
  * incremental run iff it does in the batch run, and the exact verify is
  * the same Jaccard. Each qualifying pair is emitted EXACTLY once — in the
  * micro-batch of its later member (delta×corpus when they arrive apart,
  * delta-internal when together) — so iterating the incremental operator
  * over any partition of the corpus into batches reproduces the batch
  * result, independent of arrival order. DedupStreamSpec pins this on a
  * planted corpus with within-batch and cross-batch duplicates.
  *
  * State lives in the snapshot tables, not the streaming state store —
  * nothing here grows with the stream except the lakehouse tables
  * themselves (the corpus table is the same one ingest maintains anyway),
  * so no watermark/horizon tradeoff exists in this operator.
  */
object DedupStream {

  /** Start the dedup stream over a documents directory. AvailableNow by
    * default (drain-what-exists, then stop); pass a processing-time trigger
    * for a live tail. `corpusTable` accumulates every streamed doc;
    * `pairsTable` accumulates (a, b) near-dup pairs at `threshold`.
    */
  def ingest(spark: SparkSession, srcDir: String,
             corpusTable: SnapshotTable, pairsTable: SnapshotTable,
             checkpointDir: String, threshold: Double = 0.8,
             trigger: Trigger = Trigger.AvailableNow(),
             maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, corpusTable, pairsTable, batch, batchId, threshold)
      }
      .start()

  /** One micro-batch: pairs-then-corpus appends under per-table generation
    * guards (see class doc for the replay analysis). Package-visible so the
    * replay interleavings are directly testable.
    */
  private[streaming] def commitBatch(spark: SparkSession, corpusTable: SnapshotTable,
                                     pairsTable: SnapshotTable, batch: DataFrame,
                                     batchId: Long, threshold: Double): Unit = {
    import spark.implicits._
    val gen = batchId.toInt + 1
    val delta = batch.select(col("doc_id"), col("text"))
    if (!pairsTable.currentSnapshot.exists(_.generation >= gen)) {
      val corpus = corpusTable.read(spark)
        .getOrElse(Seq.empty[(Long, String)].toDF("doc_id", "text"))
      // drop audit off: the generator's df-cap audit is a second full pass
      // over the exploded tokens per BATCH; audit the batch-mode run instead
      val pairs = TextDedup
        .minhashNearDupsIncremental(corpus, delta, threshold, logDrops = false)
        .select(col("a"), col("b"))
      pairsTable.append(pairs, generation = gen)
    }
    if (!corpusTable.currentSnapshot.exists(_.generation >= gen))
      corpusTable.append(delta, generation = gen)
    ()
  }
}
