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

final case class SnapshotMeta(
    snapshotId: Long,
    parentId: Long, // -1 = none
    generation: Int,
    files: List[DataFileMeta],
    rowCount: Long,
    counters: Map[String, Long])

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
    commit(df, generation, counters, replace = false)

  /** Replace commit: new snapshot's data = df alone (used for compacted
    * state tables like host_state where the new state supersedes the old).
    */
  def replace(df: DataFrame, generation: Int, counters: Map[String, Long] = Map.empty): SnapshotMeta =
    commit(df, generation, counters, replace = true)

  private def commit(df: DataFrame, generation: Int, counters: Map[String, Long], replace: Boolean): SnapshotMeta = {
    Files.createDirectories(snapDir)
    val parent = currentSnapshot
    val id = parent.map(_.snapshotId + 1).getOrElse(0L)
    val dataDir = tableDir.resolve(s"data/s$id")
    df.write.mode("overwrite").parquet(dataDir.toString)
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
    val files = (if (replace) Nil else parent.map(_.files).getOrElse(Nil)) ++ newFiles
    val meta = SnapshotMeta(id, parent.map(_.snapshotId).getOrElse(-1L), generation,
      files, files.map(_.rows).sum, counters)
    Files.writeString(snapDir.resolve(s"snapshot-$id.json"), Serialization.write(meta))
    // atomic pointer flip — the actual commit point
    val tmp = tableDir.resolve(s".current.tmp$id")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    meta
  }

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
}
