package graft.snapshot

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer over Parquet (SURVEY §4.3: no Iceberg
  * artifact exists in the offline environment, so the engine implements the
  * subset of Iceberg the north rule exercises):
  *
  *  - append / replace commits producing immutable snapshots
  *  - a JSON manifest per snapshot: snapshot id, parent id, generation,
  *    per-file row counts (per-partition lineage), commit counters
  *  - atomic commit by writing `snapshot-<id>.json` then atomically renaming
  *    a temp pointer onto `current` (crash before the rename = clean
  *    rollback to the parent snapshot)
  *  - time-travel reads by snapshot id; resume = read `current`
  *
  * Layout:
  * {{{
  *   <root>/<table>/data/s<id>/part-*.parquet
  *   <root>/<table>/snapshots/snapshot-<id>.json
  *   <root>/<table>/current
  * }}}
  */
final case class DataFileMeta(path: String, rows: Long)

/** `dirBuckets`: storage-bucketing registry for the snapshot's data dirs —
  * maps a commit dir name ("s3") to "numBuckets:bucketCol" when that dir
  * was written with [[SnapshotTable.appendBucketed]]. Carried forward (and
  * pruned to still-referenced dirs) on every commit so the info survives
  * manifest vacuuming; absent for plain commits and pre-bucketing
  * manifests (json4s reads the missing field as None).
  */
final case class SnapshotMeta(
    snapshotId: Long,
    parentId: Long, // -1 = none
    generation: Int,
    files: List[DataFileMeta],
    rowCount: Long,
    counters: Map[String, Long],
    dirBuckets: Option[Map[String, String]] = None)

final class SnapshotTable(val root: Path, val name: String) {
  private implicit val formats: Formats = DefaultFormats

  private def tableDir: Path = root.resolve(name)
  private def snapDir: Path = tableDir.resolve("snapshots")
  private def currentPtr: Path = tableDir.resolve("current")

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentPtr)) Some(Files.readString(currentPtr).trim.toLong) else None

  def snapshot(id: Long): SnapshotMeta =
    Serialization.read[SnapshotMeta](Files.readString(snapDir.resolve(s"snapshot-$id.json")))

  def currentSnapshot: Option[SnapshotMeta] = currentSnapshotId.map(snapshot)

  def isEmpty: Boolean = currentSnapshot.forall(_.files.isEmpty)

  /** List a directory through a CLOSED stream: Files.list/Files.walk hold an
    * open fd until close() — a long-lived driver running maintain() over 13
    * tables each generation would otherwise exhaust fds.
    */
  private def listDir(dir: Path): List[Path] = {
    val s = Files.list(dir)
    try s.iterator.asScala.toList finally s.close()
  }

  /** All snapshots, oldest first (time-travel index). */
  def history: Seq[SnapshotMeta] = {
    if (!Files.exists(snapDir)) return Seq.empty
    listDir(snapDir)
      .filter(_.getFileName.toString.startsWith("snapshot-"))
      .map(p => Serialization.read[SnapshotMeta](Files.readString(p)))
      .sortBy(_.snapshotId)
  }

  /** Read table state at a snapshot (default: current). Returns None when
    * the table has no data yet (caller supplies the empty-case plan).
    */
  def read(spark: SparkSession, at: Option[Long] = None): Option[DataFrame] = {
    val meta = at.map(snapshot).orElse(currentSnapshot)
    meta.filter(_.files.nonEmpty).map(m => spark.read.parquet(m.files.map(_.path): _*))
  }

  /** Append commit: write df as new data files, new snapshot = parent files
    * + new files. Returns the committed snapshot.
    */
  def append(df: DataFrame, generation: Int, counters: Map[String, Long] = Map.empty): SnapshotMeta =
    commit(df, generation, counters, replace = false, bucketed = None)

  /** Replace commit: new snapshot's data = df alone (used for compacted
    * state tables like host_state where the new state supersedes the old).
    */
  def replace(df: DataFrame, generation: Int, counters: Map[String, Long] = Map.empty): SnapshotMeta =
    commit(df, generation, counters, replace = true, bucketed = None)

  /** Append commit whose data files are STORAGE-BUCKETED: rows are hash-
    * partitioned on `bucketCol` into `buckets` files, written through
    * Spark's bucketed-table writer so each file carries its bucket id in
    * its name, and the spec is recorded in the manifest ([[SnapshotMeta]]
    * `dirBuckets`). [[readCommitChunks]] then reconstructs scans whose
    * `outputPartitioning` Catalyst TRUSTS — a join keyed on `bucketCol`
    * reads this side with no Exchange (the Iceberg storage-partitioned-
    * join shape, SURVEY §4.3). `bucketCol` must be a stored column
    * (typically a persisted xxhash64 of the logical key so probe sides can
    * recompute it).
    */
  def appendBucketed(df: DataFrame, generation: Int, buckets: Int, bucketCol: String,
                     counters: Map[String, Long] = Map.empty): SnapshotMeta =
    commit(df, generation, counters, replace = false, bucketed = Some((buckets, bucketCol)))

  /** [[replace]] with storage-bucketed data files (see [[appendBucketed]]). */
  def replaceBucketed(df: DataFrame, generation: Int, buckets: Int, bucketCol: String,
                      counters: Map[String, Long] = Map.empty): SnapshotMeta =
    commit(df, generation, counters, replace = true, bucketed = Some((buckets, bucketCol)))

  private def commit(df: DataFrame, generation: Int, counters: Map[String, Long],
                     replace: Boolean, bucketed: Option[(Int, String)]): SnapshotMeta =
    commitRetaining(df, generation, counters,
      if (replace) Nil else currentSnapshot.map(_.files).getOrElse(Nil), bucketed)

  /** Commit `df` as a new data dir while carrying `retained` files (a
    * subset of the parent's) into the new snapshot unchanged. append =
    * retain all parent files; replace = retain none; a partial fold
    * ([[compactTiered]]) retains the files of every dir it did not merge.
    */
  private def commitRetaining(df: DataFrame, generation: Int, counters: Map[String, Long],
                              retained: List[DataFileMeta],
                              bucketed: Option[(Int, String)]): SnapshotMeta = {
    Files.createDirectories(snapDir)
    val parent = currentSnapshot
    val id = parent.map(_.snapshotId + 1).getOrElse(0L)
    val dataDir = tableDir.resolve(s"data/s$id")
    bucketed match {
      case Some((n, bc)) =>
        // bucketed layout WITHOUT the bucketed-table writer: repartition on
        // the SAME hash function the bucket reader assumes (repartition's
        // HashPartitioning and Spark's bucket-id expression are both
        // pmod(murmur3(col), n)), write plain parquet — partition index i
        // then holds exactly bucket i's rows — and stamp the bucket id into
        // each file name in the `_NNNNN` form BucketingUtils parses. The
        // saveAsTable route produced identical files but paid catalog DDL +
        // managed-committer overhead PER COMMIT (~2 s on the generation
        // commit path, measured).
        df.repartition(n, org.apache.spark.sql.functions.col(bc))
          .write.mode("overwrite").parquet(dataDir.toString)
        val partRe = "part-(\\d+)-".r
        listParquet(dataDir).foreach { p =>
          val nm = p.getFileName.toString
          partRe.findFirstMatchIn(nm).foreach { m =>
            val dot = nm.indexOf('.')
            val stem = if (dot < 0) nm else nm.substring(0, dot)
            val ext = if (dot < 0) "" else nm.substring(dot)
            Files.move(p, p.resolveSibling(s"${stem}_${m.group(1)}$ext"),
              StandardCopyOption.ATOMIC_MOVE)
          }
        }
      case None =>
        df.write.mode("overwrite").parquet(dataDir.toString)
    }
    // footer row counts read in parallel: a generation at N shuffle
    // partitions writes N part files per table — serial footer opens were
    // an O(partitions) driver-side cost that grew with parallelism and ate
    // into scaling efficiency
    val newFiles = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(
        Future.traverse(listParquet(dataDir))(p =>
          Future(DataFileMeta(p.toString, parquetRows(p)))),
        Duration.Inf)
    }
    val files = retained ++ newFiles
    // carry the bucket registry forward, pruned to dirs still referenced
    val liveDirs = files.map(f => Paths.get(f.path).getParent.getFileName.toString).toSet
    val carried = parent.flatMap(_.dirBuckets).getOrElse(Map.empty)
      .filter { case (d, _) => liveDirs(d) }
    val dirB = carried ++ bucketed.map { case (n, bc) => s"s$id" -> s"$n:$bc" }.toMap
    val meta = SnapshotMeta(id, parent.map(_.snapshotId).getOrElse(-1L), generation,
      files, files.map(_.rows).sum, counters,
      if (dirB.isEmpty) None else Some(dirB))
    Files.writeString(snapDir.resolve(s"snapshot-$id.json"), Serialization.write(meta))
    // atomic pointer flip — the actual commit point
    val tmp = tableDir.resolve(s".current.tmp$id")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    meta
  }

  /** The single storage-bucket spec of the CURRENT snapshot, when every
    * data dir was bucketed with the same (buckets, col) — the condition
    * under which a chunk chain shares one probe-side exchange.
    */
  def bucketSpec: Option[(Int, String)] = currentSnapshot.flatMap { cur =>
    val dirs = cur.files.map(f => Paths.get(f.path).getParent.getFileName.toString).distinct
    val reg = cur.dirBuckets.getOrElse(Map.empty)
    val specs = dirs.map(reg.get).distinct
    specs match {
      case List(Some(s)) =>
        val Array(n, bc) = s.split(":", 2)
        Some((n.toInt, bc))
      case _ => None
    }
  }

  /** Current data as one DataFrame PER COMMIT DIR, each reconstructed with
    * its storage bucketing where the manifest records one ([[SnapshotMeta]]
    * `dirBuckets`): the scan of a bucketed dir reports
    * `HashPartitioning(bucketCol, n)`, so joins keyed on the bucket column
    * need NO exchange on that side. Dirs without a recorded spec fall back
    * to plain scans (correct, just exchange-paying). None when the table is
    * empty. Chunk order: oldest dir first.
    */
  def readCommitChunks(spark: SparkSession): Option[Seq[DataFrame]] =
    currentSnapshot.filter(_.files.nonEmpty).map { cur =>
      val reg = cur.dirBuckets.getOrElse(Map.empty)
      cur.files.groupBy(f => Paths.get(f.path).getParent).toSeq
        .sortBy(_._1.getFileName.toString.stripPrefix("s").toLong)
        .map { case (dir, files) =>
          reg.get(dir.getFileName.toString) match {
            case Some(spec) =>
              val Array(n, bc) = spec.split(":", 2)
              bucketedScan(spark, dir, n.toInt, bc)
            case None => spark.read.parquet(files.map(_.path): _*)
          }
        }
    }

  /** Register-and-scan a bucketed data dir through the session catalog:
    * CREATE TABLE ... CLUSTERED BY is the only public surface through
    * which a file scan reports bucket partitioning. The table is EXTERNAL
    * (LOCATION) — drop never touches data files — and re-created on every
    * call so the file listing is never stale across commits/rollbacks that
    * reuse a dir name.
    */
  // Bounded LRU, not a bare map: a long crawl's compaction cadence mints a
  // NEW key per (dir, listing) on every fold/vacuum, and an unbounded cache
  // retains every stale analyzed DataFrame (file index included) plus its
  // orphaned graft_b_* catalog registration for the life of a driver that
  // is designed to run 10^10-row crawls. 64 entries cover any live chain
  // (the compaction cadences cap chains at ~24 dirs); eviction DROPs the
  // catalog table — safe for still-live DataFrames, which hold their
  // resolved relation and never re-consult the catalog.
  private val bucketedScanCache =
    new java.util.LinkedHashMap[String, (String, SparkSession, DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, SparkSession, DataFrame)]): Boolean =
        if (size > 64) {
          val (ident, sess, _) = e.getValue
          try { if (!sess.sparkContext.isStopped) sess.sql(s"DROP TABLE IF EXISTS `$ident`") }
          catch { case _: Exception => () }
          true
        } else false
    }

  private def bucketedScan(spark: SparkSession, dir: Path, n: Int, bc: String): DataFrame = {
    // committed dirs are immutable, so a registration is reusable for the
    // table's lifetime — keyed by the dir's current file listing so a
    // rollback-then-recommit that reuses the dir NAME with different files
    // re-registers (DROP first) instead of serving a stale catalog listing.
    // Without the cache every generation pays footer-read + DDL per dir per
    // read site. The session lives in the VALUE and is compared by eq —
    // identityHashCode alone can be reused by the GC for a new session,
    // which must not be served a dead session's DataFrame.
    val listing = listParquet(dir).map(_.getFileName.toString).mkString(",")
    val key = s"${System.identityHashCode(spark)}#$dir#$n#$bc#${listing.hashCode}"
    bucketedScanCache.synchronized {
      val hit = bucketedScanCache.get(key)
      if (hit != null && (hit._2 eq spark)) hit._3
      else {
        val ident = s"graft_b_${name}_${dir.getFileName}_" +
          java.lang.Integer.toHexString(dir.toString.hashCode)
        val schemaDdl = spark.read.parquet(dir.toString).schema.toDDL
        spark.sql(s"DROP TABLE IF EXISTS `$ident`")
        // CLUSTERED only — no SORTED BY: the bucketed writer repartitions
        // but does NOT sort within files, and a sort claim the data doesn't
        // honour becomes silent SMJ corruption the moment anyone enables
        // spark.sql.legacy.bucketedTableScan.outputOrdering (off by
        // default, which is the only reason the claim was inert). The
        // exchange-free join shape needs only the bucketing.
        spark.sql(s"CREATE TABLE `$ident` ($schemaDdl) USING parquet " +
          s"CLUSTERED BY (`$bc`) INTO $n BUCKETS LOCATION '$dir'")
        val df = spark.table(ident)
        bucketedScanCache.put(key, (ident, spark, df))
        df
      }
    }
  }

  /** Bucket id stamped in a bucketed data file's name (the `_NNNNN` suffix
    * [[appendBucketed]]'s rename puts before the extension). None for files
    * from non-bucketed commits.
    */
  private def fileBucketId(fileName: String): Option[Int] = {
    val stem = fileName.indexOf('.') match {
      case -1 => fileName
      case i => fileName.substring(0, i)
    }
    val u = stem.lastIndexOf('_')
    if (u < 0) None
    else {
      val tail = stem.substring(u + 1)
      if (tail.nonEmpty && tail.forall(_.isDigit)) Some(tail.toInt) else None
    }
  }

  /** Plain scan of the current snapshot restricted to the data files whose
    * stamped bucket id passes `keep(numBuckets, bucketId)` under their dir's
    * recorded spec — FILE-level pruning decided at listing time from the
    * manifest alone, so a probe that knows its occupied buckets reads
    * O(occupied/total) of the table with ZERO plan-side cost (no thousand-
    * literal `IN` for Catalyst to fold or parquet to stat-check; contrast
    * the [[readCommitChunks]] + `isInCollection` route, whose planning cost
    * grows with the key-list size). `bucketCol` names the column the
    * caller's keys hash: dirs bucketed on ANY OTHER column are always kept
    * in full — pruning them by ids routed under a different column's hash
    * would silently drop matching rows — as are dirs with no spec at all
    * (correct, just unpruned). None when the table is empty or every file
    * was skipped (the caller supplies the empty-case plan).
    *
    * The scan does NOT report bucket partitioning (it is a plain
    * `spark.read.parquet` over the kept paths) — use [[readCommitChunks]]
    * when a downstream join needs the exchange-free bucketed shape.
    */
  def readBucketSkipped(spark: SparkSession, bucketCol: String,
                        keep: (Int, Int) => Boolean): Option[DataFrame] =
    currentSnapshot.filter(_.files.nonEmpty).flatMap { cur =>
      val reg = cur.dirBuckets.getOrElse(Map.empty)
      val kept = cur.files.filter { f =>
        val p = Paths.get(f.path)
        reg.get(p.getParent.getFileName.toString) match {
          case Some(spec) =>
            val Array(n, bc) = spec.split(":", 2)
            bc != bucketCol ||
              fileBucketId(p.getFileName.toString).forall(keep(n.toInt, _))
          case None => true
        }
      }
      if (kept.isEmpty) None else Some(spark.read.parquet(kept.map(_.path): _*))
    }

  /** Number of live commit dirs in the current snapshot (manifest-only —
    * no file IO, no Spark job). This is the anti-join chain length a
    * chunked reader pays, and the signal [[compactTiered]] bounds.
    */
  def commitDirCount: Int =
    currentSnapshot.map(_.files.map(f => Paths.get(f.path).getParent).distinct.size).getOrElse(0)

  /** Rows added by this commit relative to its parent (free from the
    * manifests — no Spark job). For replace commits this is the new total.
    */
  def deltaRows(meta: SnapshotMeta): Long =
    meta.rowCount - (if (meta.parentId >= 0) snapshot(meta.parentId).rowCount else 0L)

  /** Time-travel the current pointer back until the table's latest commit
    * is from generation <= gen (crash-recovery: discard partial-generation
    * commits whose processed_queries barrier never landed). Data files of
    * discarded snapshots stay on disk (they are unreachable, like Iceberg
    * orphans) — commits are pointer flips, so this is atomic per table.
    */
  def rollbackToGeneration(gen: Int): Unit = {
    var cur = currentSnapshot
    while (cur.exists(_.generation > gen)) {
      val parentId = cur.get.parentId
      if (parentId < 0) {
        Files.deleteIfExists(currentPtr)
        cur = None
      } else {
        val tmp = tableDir.resolve(s".current.tmp.rb$parentId")
        Files.writeString(tmp, parentId.toString)
        Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        cur = Some(snapshot(parentId))
      }
    }
  }

  /** Bin-pack compaction — the operational answer to the small-files
    * problem this table layout accumulates at scale (every generation's
    * append adds one file set; at 10⁴ generations a 10¹⁰-row seen table
    * would otherwise carry ~10⁵ files and every scan pays the open/footer
    * cost per file). Rewrites the CURRENT file list into
    * ceil(totalBytes / targetFileBytes) files via a replace commit; history
    * stays time-travelable (old snapshots keep their file lists until
    * [[vacuum]]). No-op (None) when the table is empty or already compact.
    */
  def compact(spark: SparkSession, targetFileBytes: Long = 128L << 20): Option[SnapshotMeta] =
    currentSnapshot.filter(_.files.nonEmpty).flatMap { cur =>
      bucketSpec match {
        case Some((n, bc)) =>
          // bucketed table: fold k commit dirs × n files into ONE dir × n
          // files, preserving the bucket layout (the rewrite shuffles on the
          // bucket column — the price of keeping exchange-free reads)
          val nDirs = cur.files.map(f => Paths.get(f.path).getParent).distinct.size
          if (nDirs <= 1) None
          else Some(replaceBucketed(spark.read.parquet(cur.files.map(_.path): _*),
            cur.generation, n, bc, cur.counters))
        case None =>
          val totalBytes = cur.files.map(f =>
            try Files.size(Paths.get(f.path)) catch { case _: Exception => 0L }).sum
          val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
          if (cur.files.size <= nFiles) None
          else {
            val df = spark.read.parquet(cur.files.map(_.path): _*)
            // coalesce, not repartition: compaction is an IO rewrite, no shuffle
            Some(replace(df.coalesce(nFiles), cur.generation, cur.counters))
          }
      }
    }

  /** MAJOR rebucketing pass: rewrite the whole table as ONE dir bucketed
    * (`buckets`, `bucketCol`) — the self-heal for a chain whose dirs carry
    * MIXED or stale specs (a restart with a different bucket count, or
    * plain commits from before a table was bucketed), states in which
    * [[bucketSpec]] is None/stale and every spec-dependent path — the
    * tiered fold, storage-aligned chain joins, file skips — silently
    * degrades. Rows and generation are preserved; only the layout moves.
    * No-op on an empty table.
    */
  def rebucket(spark: SparkSession, buckets: Int, bucketCol: String): Option[SnapshotMeta] =
    currentSnapshot.filter(_.files.nonEmpty).map { cur =>
      replaceBucketed(spark.read.parquet(cur.files.map(_.path): _*),
        cur.generation, buckets, bucketCol, cur.counters)
    }

  /** Size-tiered MINOR compaction for a bucketed table (the LSM merge shape):
    * when the commit-dir chain exceeds `targetDirs`, fold the SMALLEST
    * (by manifest row count) `nDirs - targetDirs + 1` dirs into one new
    * bucketed dir and retain every other dir's files untouched — the new
    * snapshot lands at exactly `targetDirs` dirs. Contrast [[compact]]
    * (major): that rewrites the WHOLE table, O(|table|) per call; at 10¹⁰
    * rows with small per-generation deltas a major fold every K generations
    * rewrites the full base each time, while smallest-first merging rewrites
    * a row O(log(|table|/|delta|)) times over its life — the standard
    * size-tiered write-amplification bound. Rows, bucketing (same
    * `repartition(n, col)` the chain reader assumes) and the manifest
    * registry are preserved; only dir boundaries move, so any consumer of
    * [[readCommitChunks]] sees the same union. No-op (None) when the table
    * is not uniformly bucketed or the chain is already within bounds.
    */
  def compactTiered(spark: SparkSession, targetDirs: Int): Option[SnapshotMeta] = {
    require(targetDirs >= 1, s"targetDirs must be >= 1, got $targetDirs")
    currentSnapshot.filter(_.files.nonEmpty).flatMap { cur =>
      bucketSpec.flatMap { case (n, bc) =>
        val byDir = cur.files.groupBy(f => Paths.get(f.path).getParent)
        if (byDir.size <= targetDirs) None
        else {
          // smallest rows first; dir name tie-breaks for determinism
          val foldDirs = byDir.toSeq
            .sortBy { case (d, fs) => (fs.map(_.rows).sum, d.getFileName.toString) }
            .take(byDir.size - targetDirs + 1)
            .map(_._1).toSet
          val (folded, kept) = cur.files.partition(f => foldDirs(Paths.get(f.path).getParent))
          val df = spark.read.parquet(folded.map(_.path): _*)
          Some(commitRetaining(df, cur.generation, cur.counters, kept, Some((n, bc))))
        }
      }
    }
  }

  /** Expire history: keep the last `keepSnapshots` snapshots on the current
    * chain, delete every other snapshot manifest and every data file no
    * kept snapshot references (rollback orphans included). Returns the
    * number of data files deleted. Time-travel to expired snapshots is gone
    * afterwards — the Iceberg expire-snapshots contract.
    */
  def vacuum(keepSnapshots: Int = 2): Int = {
    val cur = currentSnapshot match {
      case Some(c) => c
      case None => return 0
    }
    // walk the parent chain from current, stopping at any manifest a prior
    // vacuum already expired (the chain may be shorter than keepSnapshots)
    val keep = scala.collection.mutable.ListBuffer[SnapshotMeta](cur)
    var walking = true
    while (walking && keep.size < keepSnapshots && keep.last.parentId >= 0) {
      val pid = keep.last.parentId
      if (Files.exists(snapDir.resolve(s"snapshot-$pid.json"))) keep += snapshot(pid)
      else walking = false
    }
    val keepIds = keep.map(_.snapshotId).toSet
    val referenced = keep.flatMap(_.files.map(f => Paths.get(f.path).normalize.toString)).toSet
    // drop expired manifests (everything not on the kept chain)
    history.filterNot(m => keepIds(m.snapshotId))
      .foreach(m => Files.deleteIfExists(snapDir.resolve(s"snapshot-${m.snapshotId}.json")))
    // delete unreferenced data files, then empty s<id> dirs
    val dataRoot = tableDir.resolve("data")
    if (!Files.exists(dataRoot)) return 0
    var deleted = 0
    val walk = Files.walk(dataRoot)
    val entries = try walk.iterator.asScala.toList.reverse finally walk.close()
    entries.foreach { p =>
      if (Files.isRegularFile(p) && !referenced(p.normalize.toString)) {
        Files.deleteIfExists(p); deleted += 1
      } else if (Files.isDirectory(p) && p != dataRoot) {
        try { if (listDir(p).isEmpty) Files.deleteIfExists(p) }
        catch { case _: Exception => () }
      }
    }
    deleted
  }

  private def listParquet(dir: Path): List[Path] =
    listDir(dir).filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)

  /** Row count from the parquet footer (no data read). */
  private def parquetRows(p: Path): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toString), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}

/** A set of snapshot tables under one root — the engine's "warehouse". */
final class SnapshotStore(val root: Path) {
  def table(name: String): SnapshotTable = new SnapshotTable(root, name)
}

object SnapshotStore {
  def apply(root: String): SnapshotStore = {
    val p = Paths.get(root)
    Files.createDirectories(p)
    new SnapshotStore(p)
  }

  /** The storage-bucket id [[SnapshotTable.appendBucketed]] assigns to a
    * LONG key: `repartition(n, col)` routes rows by
    * `pmod(murmur3(key, seed=42), n)` and the writer stamps the partition
    * index into the file name, so this driver-side replica lets a probe
    * side turn its occupied keys into the file set to read
    * ([[SnapshotTable.readBucketSkipped]]). Pinned against Spark's own
    * `pmod(hash(col), n)` by SnapshotStoreSpec — a divergence here would be
    * a silent candidate-recall loss, not an error.
    */
  def bucketIdOfLong(key: Long, numBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(key, org.apache.spark.sql.types.LongType, 42L).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }
}
