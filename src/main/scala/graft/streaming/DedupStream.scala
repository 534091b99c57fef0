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
  *  1. near-dup pairs = [[TextDedup.minhashNearDupsIndexed]](corpus-so-far,
  *     band-index-so-far, delta): delta vs the accumulated corpus AND
  *     delta-internal, with NO corpus text scan on the candidate side — the
  *     delta's band keys prune the PERSISTED index read (`bkey IN (...)`
  *     pushed into bucket-stored parquet: bucket pruning + row-group
  *     stats), and the exact verify re-reads only candidate-pair ids. Per-
  *     batch cost is O(delta + candidates), independent of corpus size —
  *     the property that lets the stream run forever at 100 TB;
  *  2. three generation-guarded appends, in order: pairs, then the delta's
  *     [[TextDedup.bandIndexOf]] rows (bucketed by bkey — the index commit
  *     chunks read back exchange-free, same layout as the crawl engine's
  *     seen table), then the delta itself. foreachBatch is at-least-once: a
  *     crash in any window replays the batch and the per-table guards
  *     re-run exactly the missing appends — pairs are always computed
  *     against corpus/index states EXCLUDING the current batch, which the
  *     append order preserves across replays.
  *
  * The index table's commit chain is folded by the same size-tiered minor
  * compaction as the crawl engine's seen table ([[SnapshotTable
  * .compactTiered]], fired when the chain reaches `autoCompactDirs`), so a
  * long-running stream never decays into thousand-dir reads.
  *
  * ==Stream == batch (exact, not approximate)==
  * The drained pairs table equals [[TextDedup.minhashNearDups]] over the
  * whole corpus, as a set: banding is a pure per-doc function (seeded,
  * doc-independent), so the persisted index of a corpus is the union of its
  * batches' indexes, a pair (a, b) shares a band signature in the
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
    * `indexTable` its band-index rows (bucketed by bkey); `pairsTable`
    * (a, b) near-dup pairs at `threshold`.
    */
  def ingest(spark: SparkSession, srcDir: String,
             corpusTable: SnapshotTable, pairsTable: SnapshotTable,
             indexTable: SnapshotTable,
             checkpointDir: String, threshold: Double = 0.8,
             trigger: Trigger = Trigger.AvailableNow(),
             maxFilesPerTrigger: Int = 1,
             indexBuckets: Int = 32,
             autoCompactDirs: Int = 16): StreamingQuery =
    spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, corpusTable, pairsTable, indexTable, batch, batchId,
          threshold, indexBuckets, autoCompactDirs)
      }
      .start()

  /** One micro-batch: pairs-then-index-then-corpus appends under per-table
    * generation guards (see class doc for the replay analysis; pairs commits
    * FIRST so its recompute only ever sees index/corpus states without the
    * current batch). Package-visible so the replay interleavings are
    * directly testable.
    */
  private[streaming] def commitBatch(spark: SparkSession, corpusTable: SnapshotTable,
                                     pairsTable: SnapshotTable, indexTable: SnapshotTable,
                                     batch: DataFrame, batchId: Long, threshold: Double,
                                     indexBuckets: Int = 32,
                                     autoCompactDirs: Int = 16): Unit = {
    import spark.implicits._
    val gen = batchId.toInt + 1
    val delta = batch.select(col("doc_id"), col("text"))
    if (!pairsTable.currentSnapshot.exists(_.generation >= gen)) {
      val corpus = corpusTable.read(spark)
        .getOrElse(Seq.empty[(Long, String)].toDF("doc_id", "text"))
      val index = indexTable.readCommitChunks(spark)
        .map(_.reduce(_ unionByName _))
        .getOrElse(Seq.empty[(Long, Int, Array[Long], Long)]
          .toDF("id", "band", "bsig", "bkey"))
      // drop audit off: the generator's bucket-cap audit is a second pass
      // over the band rows per BATCH; audit the batch-mode run instead
      val pairs = TextDedup
        .minhashNearDupsIndexed(corpus, index, delta, threshold, logDrops = false)
        .select(col("a"), col("b"))
      pairsTable.append(pairs, generation = gen)
    }
    if (!indexTable.currentSnapshot.exists(_.generation >= gen))
      indexTable.appendBucketed(TextDedup.bandIndexOf(delta), generation = gen,
        buckets = indexBuckets, bucketCol = "bkey")
    if (!corpusTable.currentSnapshot.exists(_.generation >= gen))
      corpusTable.append(delta, generation = gen)
    if (autoCompactDirs > 0 && indexTable.commitDirCount >= autoCompactDirs)
      indexTable.compactTiered(spark, math.max(1, autoCompactDirs / 2))
    ()
  }
}
