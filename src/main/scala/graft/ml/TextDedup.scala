package graft.ml

import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-deduplication operators for the training-data pipeline, all
  * designed around inverted-index / banding joins so the pair space never
  * goes quadratic — the property that matters at 100 TB. Every operator
  * shuffles on a bounded key (text hash, token, band signature), never on a
  * cross join.
  */
object TextDedup {

  /** Exact dedup by content hash: one shuffle on the text key, keeps the
    * smallest id per group (deterministic winner).
    */
  def exactDups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select($"keep_id", $"dup_count")

  private implicit class Dollar(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Distinct-token sets per doc: the shared base of the Jaccard family. */
  def docTokens(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .filter($"tok" =!= "")

  /** Exact n-gram (word) Jaccard near-dup pairs ≥ threshold via an
    * inverted-index self-join: explode distinct tokens, join on token,
    * count shared tokens per pair, compute |A∩B| / (|A|+|B|-|A∩B|).
    * Shuffle keys: token (bounded by vocabulary), then pair id. Hot tokens
    * are the skew risk at scale — cap them with a document-frequency filter
    * (maxDf), exactly the standard trick.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxDf: Long = 1000000L): DataFrame =
    jaccardPairsFromTokens(docTokens(docs, idCol, textCol), threshold, maxDf)

  /** Distinct word-k-gram shingles per doc (requires ≥ k words; callers on
    * shorter docs should fall back to word tokens).
    */
  def shingleTokens(docs: DataFrame, shingleSize: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = filter(split(col(textCol), " "), t => t =!= "")
    docs.where(size(words) >= shingleSize) // guard: sequence() needs stop >= start
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(sequence(lit(0), size(words) - lit(shingleSize)),
          i => concat_ws(" ", slice(words, i + 1, lit(shingleSize)))))).as("tok"))
  }

  /** Jaccard ≥ threshold pairs over any (id, tok) token table. */
  def jaccardPairsFromTokens(toks: DataFrame, threshold: Double,
                             maxDf: Long = 1000000L): DataFrame = {
    val sizes = toks.groupBy($"id").agg(count(lit(1)).as("n"))
    val byDf = toks.groupBy($"tok").agg(collect_list($"id").as("ids"), count(lit(1)).as("df"))
      .filter($"df" <= maxDf)
    // pair generation from postings lists (ids per token), a<b
    val pairs = byDf.select(explode(expr(
      "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)")).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard", $"shared" / ($"na" + $"nb" - $"shared"))
      .filter($"jaccard" >= threshold)
      .select($"a", $"b", $"shared", $"na", $"nb")
  }

  /** MinHash signature column: `numHashes` permutations approximated by
    * seeded murmur3 over word shingles (min over shingle hashes per seed) —
    * all inside codegen'd higher-order functions, no UDF.
    */
  def minhashSignature(textCol: Column, shingleSize: Int, numHashes: Int): Column =
    minhashFromHashes(shingleHashes(textCol, shingleSize), numHashes)

  /** Base shingle hashes, computed ONCE per doc (strings are hashed a single
    * time; the N permutations below are arithmetic over these longs — the
    * standard one-hash + N-mix MinHash construction. Without this split the
    * string shingle array is re-built per permutation: measured 30×+ slower).
    */
  def shingleHashes(textCol: Column, shingleSize: Int): Column = {
    val words = split(textCol, " ")
    val n = size(words)
    val shingles = when(n >= shingleSize,
      transform(sequence(lit(0), n - lit(shingleSize)),
        i => concat_ws(" ", slice(words, i + 1, lit(shingleSize)))))
      .otherwise(array(concat_ws(" ", words)))
    transform(shingles, s => xxhash64(s))
  }

  /** i-th permutation = min over xxhash64(h, i) — re-hashing the base longs
    * is codegen'd, seed-indexed, and immune to ANSI-mode overflow (a
    * multiplicative family would throw under spark.sql.ansi.enabled).
    */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }: _*)

  /** MinHash + LSH banding: signature → `bands` band keys → group docs per
    * (band index, band signature) bucket → candidate pairs from buckets.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b, r=rows/band.
    * One shuffle on the band key; bucket sizes are the skew knob (maxBucket
    * caps pathological buckets, logged upstream).
    */
  def minhashLshCandidates(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text", shingleSize: Int = 3,
                           numHashes: Int = 32, bands: Int = 8,
                           maxBucket: Int = 1000): DataFrame = {
    val r = numHashes / bands
    // two-step projection: base shingle hashes materialize once (CollapseProject
    // won't inline a multiply-referenced expensive alias), permutations are
    // cheap long arithmetic over them
    val sig = docs.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("hs"))
      .select($"id", minhashFromHashes($"hs", numHashes).as("sig"))
    val banded = sig.select($"id", explode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), slice($"sig", b * r + 1, lit(r)).as("bsig")))).as("bk"))
      .select($"id", $"bk.band".as("band"), $"bk.bsig".as("bsig"))
    banded.groupBy($"band", $"bsig").agg(collect_set($"id").as("ids"))
      .filter(size($"ids") > 1 && size($"ids") <= maxBucket)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)")).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b")).distinct()
  }

  /** 64-bit SimHash: weighted sign-sum of token hashes. Near-dups have
    * small Hamming distance; candidates are found by banding the 64 bits
    * into 4×16-bit chunks (pigeonhole: distance ≤ 3 ⇒ one chunk equal).
    */
  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val counts = new Array[Long](64)
      if (text != null) text.split(" ").iterator.filter(_.nonEmpty).foreach { t =>
        val h = Hashing.murmur3_64(t, 0x51a4L)
        var i = 0
        while (i < 64) { counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      }
      var sh = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) sh |= (1L << i); i += 1 }
      sh
    }

  def simhashCandidates(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", maxBucket: Int = 1000): DataFrame = {
    val withSh = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val banded = withSh.select($"id", $"sh", explode(array((0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright($"sh", c * 16).bitwiseAND(lit(0xffffL)).as("bits"))): _*)).as("bk"))
      .select($"id", $"sh", $"bk.chunk".as("chunk"), $"bk.bits".as("bits"))
    val buckets = banded.groupBy($"chunk", $"bits")
      .agg(collect_set(struct($"id", $"sh")).as("ids"))
      .filter(size($"ids") > 1 && size($"ids") <= maxBucket)
    buckets.select(explode(expr(
      "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a.id as a, b.id as b, a.sh as sha, b.sh as shb)))), p -> p.a < p.b)")).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"),
        bit_count($"p.sha".bitwiseXOR($"p.shb")).as("hamming"))
      .distinct()
  }

  /** Embedding-cosine near-dup pairs: unit-normalize, LSH-bucket by the
    * sign pattern of `planes` random hyperplanes (seeded, deterministic),
    * exact-verify cosine within buckets. No cross join anywhere.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        planes: Int = 8): DataFrame = {
    val dim = 64
    val planeOf = (p: Int) => array((0 until dim).map { i =>
      lit(if (((Hashing.det(0x97a3e5L, p, i) >> 17) & 1L) == 1L) 1.0f else -1.0f)
    }: _*)
    val v = col(vecCol)
    val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    val sigBits = (0 until planes).map { p =>
      val dot = aggregate(zip_with(v, planeOf(p), (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withSig = emb.select(col(idCol).as("id"), v.as("vec"), norm.as("nrm"), sigBits.as("bucket"))
    val pairs = withSig.as("x").join(withSig.as("y"),
      col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
    pairs.select(col("x.id").as("a"), col("y.id").as("b"),
      (aggregate(zip_with(col("x.vec"), col("y.vec"), (p, q) => p * q),
        lit(0.0d), (acc, t) => acc + t) / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter($"cosine" >= threshold)
  }
}
