package graft.util

import java.nio.charset.StandardCharsets

/** Deterministic hashing primitives used everywhere randomness-like behavior
  * is needed (synthetic web generation, Bloom/cuckoo filters, seeded
  * schedules). Pure functions of their inputs — no global state, no wall
  * clock — so the sequential oracle and the distributed engine derive
  * identical streams.
  *
  * Algorithms are the public-domain FNV-1a (64-bit) and Austin Appleby's
  * MurmurHash3 x64/128 (public domain), the pair the north rule names for
  * the blocked-Bloom double hashing.
  */
object Hashing {

  // ---------------------------------------------------------------- FNV-1a
  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(s.getBytes(StandardCharsets.UTF_8))

  // ------------------------------------------------------- MurmurHash3 x64
  /** 64-bit finalizer from MurmurHash3 (fmix64). */
  @inline def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** MurmurHash3 x64/128, first 64 bits. */
  def murmur3_64(bytes: Array[Byte], seed: Long): Long = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val len = bytes.length
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    var i = 0
    while (i < nblocks) {
      val base = i * 16
      var k1 = getLongLE(bytes, base)
      var k2 = getLongLE(bytes, base + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5
      i += 1
    }
    // tail
    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (bytes(tail + j) & 0xffL); j -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (bytes(tail + j) & 0xffL); j -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    h1
  }

  @inline private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  def murmur3_64(s: String, seed: Long): Long =
    murmur3_64(s.getBytes(StandardCharsets.UTF_8), seed)

  // ------------------------------------------------- deterministic streams
  /** Deterministic 64-bit value keyed by (seed, parts...). Used as the
    * "random" source for the synthetic web: the i-th draw for entity e is
    * `det(seed, e, i)` — no mutable RNG state, safe to evaluate in any
    * distributed order.
    */
  def det(seed: Long, parts: Any*): Long = {
    var h = fmix64(seed ^ 0x9e3779b97f4a7c15L)
    parts.foreach { p =>
      val ph = p match {
        case s: String => murmur3_64(s, h)
        case l: Long => fmix64(h ^ l)
        case i: Int => fmix64(h ^ i.toLong)
        case other => murmur3_64(String.valueOf(other), h)
      }
      h = fmix64(h ^ ph)
    }
    h
  }

  /** Base-257 polynomial over UTF-16 code units of s[from, until), seeded
    * with the FNV offset — the rolling-hash kernel shared by the document
    * fingerprint and winnowing gram hashes. Wraps mod 2^64 (Java long
    * overflow), matching `(acc*257 + c) % 2^64` in unsigned arithmetic.
    */
  def poly257(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h = h * 257L + s.charAt(i).toLong; i += 1 }
    h
  }

  /** Uniform double in [0,1) from a hash. */
  @inline def toUnit(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** Non-negative bounded draw. */
  @inline def bounded(h: Long, n: Int): Int = {
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }

  @inline def boundedLong(h: Long, n: Long): Long = {
    val m = h % n
    if (m < 0) m + n else m
  }
}
