package graft.operators

import graft.util.Hashing
import org.scalatest.funsuite.AnyFunSuite

class FiltersSpec extends AnyFunSuite {

  test("murmur3/fnv1a are stable and spread") {
    assert(Hashing.fnv1a64("") == 0xcbf29ce484222325L) // FNV offset basis
    assert(Hashing.murmur3_64("abc", 0) == Hashing.murmur3_64("abc", 0))
    assert(Hashing.murmur3_64("abc", 0) != Hashing.murmur3_64("abd", 0))
    val hs = (0 until 1000).map(i => Hashing.murmur3_64(s"key$i", 42)).toSet
    assert(hs.size == 1000)
  }

  test("blocked bloom: no false negatives, bounded false positives") {
    val n = 50000
    val bloom = BlockedBloom.sized(n, bitsPerKey = 10)
    val keys = (0 until n).map(i => s"https://host$i.example/p$i")
    keys.foreach(bloom.add)
    assert(keys.forall(bloom.mightContain), "bloom must never forget a key")
    val fps = (0 until 20000).count(i => bloom.mightContain(s"https://absent$i.example/x"))
    assert(fps < 20000 * 0.03, s"fp rate too high: $fps/20000")
  }

  test("blocked bloom merge == union") {
    val a = BlockedBloom.sized(1000)
    val b = BlockedBloom.sized(1000)
    (0 until 500).foreach(i => a.add(s"a$i"))
    (0 until 500).foreach(i => b.add(s"b$i"))
    a.merge(b)
    assert((0 until 500).forall(i => a.mightContain(s"a$i") && a.mightContain(s"b$i")))
  }

  test("cuckoo filter: insert/lookup/delete, exact negatives below capacity") {
    val cf = CuckooFilter.sized(10000)
    val keys = (0 until 8000).map(i => s"https://hot.example/page$i")
    keys.foreach(k => assert(cf.insert(k)))
    assert(cf.negativesAreExact)
    assert(keys.forall(cf.contains))
    assert(cf.delete(keys.head))
    assert(!cf.contains(keys.head) || !cf.negativesAreExact)
    val fps = (0 until 20000).count(i => cf.contains(s"absent$i"))
    assert(fps < 20000 * 0.01, s"cuckoo fp rate too high: $fps")
  }

  test("bloom_agg distributed build equals local build; byte probes agree") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val keys = (0 until 5000).map(i => s"u$i")
    val nb = BlockedBloom.blocksFor(5000, 10)
    val blob = keys.toDF("k")
      .agg(org.apache.spark.sql.functions.expr(s"bloom_agg(k, $nb, 7)"))
      .head().getAs[Array[Byte]](0)
    val local = BlockedBloom.sized(5000, bitsPerKey = 10)
    keys.foreach(local.add)
    assert(blob.sameElements(local.toBytes),
      "TypedImperativeAggregate build must equal sequential build")
    // static byte-blob probe == instance probe, incl. absent keys
    val utf = (s: String) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(keys.forall(k => BlockedBloom.probeBytes(blob, utf(k))))
    (0 until 2000).foreach { i =>
      assert(BlockedBloom.probeBytes(blob, utf(s"absent$i")) ==
        local.mightContain(s"absent$i"))
    }
    // or-merge in byte form == merge in object form
    val b2 = BlockedBloom.sized(5000, bitsPerKey = 10)
    (0 until 100).foreach(i => b2.add(s"v$i"))
    val merged = BlockedBloom.orBytes(blob, b2.toBytes)
    assert(BlockedBloom.fromBytes(merged).bitCount == local.merge(b2).bitCount)
  }

  test("cuckoo byte serialization round-trips; byte probe == instance probe") {
    val cf = CuckooFilter.sized(5000)
    val keys = (0 until 4000).map(i => s"https://hot.example/p$i")
    keys.foreach(cf.insert)
    val blob = cf.toBytes
    assert(CuckooFilter.negativesExactBytes(blob) == cf.negativesAreExact)
    val utf = (s: String) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(keys.forall(k => CuckooFilter.containsBytes(blob, utf(k))))
    (0 until 2000).foreach { i =>
      assert(CuckooFilter.containsBytes(blob, utf(s"absent$i")) == cf.contains(s"absent$i"))
    }
    val rt = CuckooFilter.fromBytes(blob)
    assert(rt.size == cf.size && rt.negativesAreExact == cf.negativesAreExact)
    assert(keys.forall(rt.contains))
  }
}
