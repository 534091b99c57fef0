package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.Dataset

/** Blocked Bloom filter for the distributed URL-seen prefilter (north rule:
  * FNV-1a + murmur3 double hashing, per-partition build merged via
  * treeAggregate).
  *
  * Layout: `blocks` 512-bit cache-line blocks (8 longs each). A key selects
  * one block with h1 (FNV-1a) and sets/tests k bits inside that block
  * derived by double hashing h(i) = h1 + i*h2 (Kirsch–Mitzenmacher), h2 from
  * murmur3. One cache line per probe — the standard blocked-Bloom design
  * (Putze, Sanders, Singler, "Cache-, Hash- and Space-Efficient Bloom
  * Filters", WEA 2007).
  *
  * Role in dedup (SURVEY §2.4 D1): the Bloom tier only ROUTES — "definitely
  * new" keys skip the exact anti-join shuffle, "maybe seen" keys go through
  * it. False positives therefore cost a shuffled row, never a dropped URL;
  * the exact tier is the membership authority and the final seen set is
  * bit-for-bit the reference's.
  */
final class BlockedBloom(val bits: Array[Long], val numBlocks: Int, val k: Int)
    extends Serializable {

  @inline private def blockOf(h1: Long): Int =
    ((h1 >>> 32) % numBlocks).toInt.abs

  def add(key: String): Unit = {
    val h1 = Hashing.fnv1a64(key)
    val h2 = Hashing.murmur3_64(key, 0xb100dL)
    val base = blockOf(h1) << 3 // 8 longs per block
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & 0x1ffL).toInt // 0..511 within block
      bits(base + (bit >> 6)) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(key: String): Boolean = {
    val h1 = Hashing.fnv1a64(key)
    val h2 = Hashing.murmur3_64(key, 0xb100dL)
    val base = blockOf(h1) << 3
    var i = 0
    while (i < k) {
      val bit = ((h1 + i.toLong * h2) & 0x1ffL).toInt
      if ((bits(base + (bit >> 6)) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge (combOp of the distributed build). */
  def merge(other: BlockedBloom): BlockedBloom = {
    require(other.numBlocks == numBlocks && other.k == k)
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  def bitCount: Long = bits.map(java.lang.Long.bitCount(_).toLong).sum
}

object BlockedBloom {
  /** Size for expected n keys at ~bitsPerKey (10 → ~1% FP with k=7). */
  def sized(expectedKeys: Long, bitsPerKey: Int = 10, k: Int = 7): BlockedBloom = {
    val totalBits = math.max(512L, expectedKeys * bitsPerKey)
    val numBlocks = math.max(1L, (totalBits + 511) / 512).toInt
    new BlockedBloom(new Array[Long](numBlocks * 8), numBlocks, k)
  }

  /** Distributed build: per-partition bitsets merged via treeAggregate —
    * one pass over the seen table, no shuffle, driver gets the OR of all
    * partition filters.
    */
  def build(keys: Dataset[String], expectedKeys: Long, bitsPerKey: Int = 10): BlockedBloom = {
    val zero = sized(expectedKeys, bitsPerKey)
    keys.rdd.treeAggregate(zero)(
      seqOp = (b, key) => { b.add(key); b },
      combOp = (a, b) => a.merge(b))
  }

  /** Distributed build shaped to merge into `template` (same block count
    * and k) — the incremental-update path: build the delta's filter on the
    * executors, OR it into the driver-resident filter.
    */
  def buildLike(keys: Dataset[String], template: BlockedBloom): BlockedBloom = {
    val (nb, k) = (template.numBlocks, template.k)
    keys.rdd.treeAggregate(new BlockedBloom(new Array[Long](nb * 8), nb, k))(
      seqOp = (b, key) => { b.add(key); b },
      combOp = (a, b) => a.merge(b))
  }
}
