package graft.snapshot

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SnapshotStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(tag: String): SnapshotTable =
    SnapshotStore(Files.createTempDirectory(s"graft-snap-$tag").toString).table("t")

  test("append commits accumulate; replace supersedes; deltas from manifests") {
    val t = freshTable("basic")
    assert(t.isEmpty && t.read(spark).isEmpty)
    val m0 = t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), 1)
    assert(m0.snapshotId == 0 && m0.rowCount == 2 && t.deltaRows(m0) == 2)
    val m1 = t.append(Seq((3, "c")).toDF("id", "v"), 2)
    assert(m1.parentId == 0 && m1.rowCount == 3 && t.deltaRows(m1) == 1)
    assert(t.read(spark).get.count() == 3)
    val m2 = t.replace(Seq((9, "z")).toDF("id", "v"), 3)
    assert(m2.rowCount == 1)
    assert(t.read(spark).get.as[(Int, String)].collect().toSet == Set((9, "z")))
  }

  test("time travel reads any snapshot; history is ordered") {
    val t = freshTable("tt")
    t.append(Seq((1, "a")).toDF("id", "v"), 1)
    t.append(Seq((2, "b")).toDF("id", "v"), 2)
    t.append(Seq((3, "c")).toDF("id", "v"), 3)
    assert(t.history.map(_.snapshotId) == Seq(0L, 1L, 2L))
    assert(t.read(spark, at = Some(0L)).get.count() == 1)
    assert(t.read(spark, at = Some(1L)).get.count() == 2)
    assert(t.read(spark).get.count() == 3)
  }

  test("rollbackToGeneration discards later commits atomically; to zero empties") {
    val t = freshTable("rb")
    t.append(Seq((1, "a")).toDF("id", "v"), 1)
    t.append(Seq((2, "b")).toDF("id", "v"), 2)
    t.append(Seq((3, "c")).toDF("id", "v"), 3)
    t.rollbackToGeneration(2)
    assert(t.currentSnapshot.get.generation == 2 && t.read(spark).get.count() == 2)
    // rolled-back snapshots remain readable by id (orphaned, not deleted)
    assert(t.read(spark, at = Some(2L)).get.count() == 3)
    t.rollbackToGeneration(0)
    assert(t.read(spark).isEmpty && t.currentSnapshotId.isEmpty)
    // table is reusable after full rollback
    val m = t.append(Seq((4, "d")).toDF("id", "v"), 1)
    assert(m.snapshotId == 0 || m.rowCount == 1)
  }

  test("compact bin-packs the file list; rows and counters survive; history stays readable") {
    val t = freshTable("compact")
    // 5 appends x 4 shuffle partitions -> ~20 small files
    (1 to 5).foreach(g => t.append(
      (1 to 50).map(i => (g * 100 + i, s"v$i")).toDF("id", "v").repartition(4), g))
    val before = t.currentSnapshot.get
    assert(before.files.size >= 10)
    val meta = t.compact(spark, targetFileBytes = 1L << 30).get // everything into 1 file
    assert(meta.files.size == 1, s"expected 1 file, got ${meta.files.size}")
    assert(meta.rowCount == 250 && meta.generation == before.generation)
    assert(t.read(spark).get.as[(Int, String)].collect().toSet ==
      (for (g <- 1 to 5; i <- 1 to 50) yield (g * 100 + i, s"v$i")).toSet)
    // pre-compaction snapshot still time-travels (until vacuum)
    assert(t.read(spark, at = Some(before.snapshotId)).get.count() == 250)
    // already-compact table: no-op
    assert(t.compact(spark, targetFileBytes = 1L << 30).isEmpty)
  }

  test("vacuum expires history and deletes unreferenced data files; current chain unaffected") {
    val t = freshTable("vacuum")
    (1 to 4).foreach(g => t.append(Seq((g, s"v$g")).toDF("id", "v"), g))
    t.rollbackToGeneration(2) // snapshots 2 and 3 become rollback orphans
    val tip = t.currentSnapshot.get // snapshot 1
    val deleted = t.vacuum(keepSnapshots = 2)
    assert(deleted > 0, "the rollback orphans' data files must be deleted")
    // current chain reads intact
    assert(t.read(spark).get.as[(Int, String)].collect().toSet ==
      Set((1, "v1"), (2, "v2")))
    assert(t.currentSnapshot.get.snapshotId == tip.snapshotId)
    // expired manifests are gone; kept chain remains
    assert(t.history.map(_.snapshotId).toSet == Set(0L, 1L))
    // commits keep working after vacuum
    val m = t.append(Seq((5, "v5")).toDF("id", "v"), 3)
    assert(t.read(spark).get.count() == 3 && m.parentId == tip.snapshotId)
  }
}
