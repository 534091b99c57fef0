package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Two paths:
  *  - [[cosineTopK]]: exact brute force — the correctness baseline. The dot
  *    product is a codegen'd higher-order `aggregate(zip_with(...))`, no
  *    UDF. Cost: |Q|×|N| — use only when one side is small/broadcastable.
  *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets with
  *    multi-probe (flip one bit), shuffling on bucket keys instead of
  *    cross-joining. Recall is tunable via planes/probes.
  */
object Similarity {

  /** cosine(a, b) for two Array[Float] columns, accumulated in double in
    * index order (deterministic, matches a sequential oracle's arithmetic).
    * Runs as the native `cosine_sim` expression (one codegen'd kernel call
    * per pair — bit-identical to the former three-fold
    * aggregate/zip_with Column form, whose per-pair higher-order trees were
    * the scoring stage's dominant cost); callers must have run
    * [[graft.functions.expressions.GraftFunctions.register]] (idempotent —
    * every entry point in this object does).
    */
  def cosineCol(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Exact top-k neighbors for each query vector (brute force). The query
    * side is broadcast (it must be small); ties break on neighbor id so the
    * ranking is total and reproducible.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Random-hyperplane bucket signature (deterministic seeded planes) — the
    * native `hyperplane_bucket` expression (draw bit 13, double-width plane
    * products; bit-identical to the former planes×dim literal-tree Column
    * form). Callers must have registered the graft functions.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Long = 0xa117L): Column =
    call_function("hyperplane_bucket", vec, lit(dim), lit(planes), lit(seed))

  /** Deterministic seed centroids: the nlist corpus vectors with smallest
    * hash(id) — a seeded sample, stable under partitioning.
    */
  def sampledCodebook(corpus: DataFrame, nlist: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Float]] =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"), xxhash64(col(idCol)).as("h"))
      .orderBy("h", "cid").limit(nlist)
      .select("cvec").collect()
      .map(_.getSeq[Float](0).toArray)

  /** Lloyd's k-means codebook over a deterministic hash-sample of the
    * corpus (the standard IVF training recipe: the codebook needs a
    * representative sample, never the full 100-TB corpus). Per iteration:
    * assignment is the codegen'd literal-centroid argmin, the centroid
    * update is a (cell, dim)-keyed mean over the posexploded sample; the
    * driver only ever holds the nlist×dim codebook. Empty cells keep their
    * previous centroid. Deterministic: seed sample + hash-sample + fixed
    * iteration count, no RNG.
    */
  /** Driver-side codebook memo keyed by (canonicalized corpus plan, nlist,
    * iters, sampleN, cols): k-means is deterministic in those inputs, so a
    * repeated ivfTopK over the same corpus (the common serving pattern —
    * many query batches against one indexed corpus) reuses the trained
    * codebook instead of re-running Lloyd's per invocation. The key is the
    * ANALYZED plan: mutating the underlying files without a new plan is
    * outside the contract — call [[clearCodebookCache]] after such a swap.
    * Entries are nlist×dim floats (KBs); an unbounded map of them is safe.
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  /** Identity registry for LocalRelation data: System.identityHashCode is
    * NOT unique (and GC address reuse can recycle it), so two different
    * in-memory corpora could collide on a hash-based key and the second
    * would silently receive the first's codebook. An IdentityHashMap
    * assigns each data object a NEVER-REUSED sequence id — reference
    * equality is the exact "same DataFrame ⇒ hit" contract. Bounded: past
    * 1024 entries the registry resets; old ids are never re-issued, so
    * stale cache keys simply miss (conservative, never wrong).
    */
  private val localRelIds = new java.util.IdentityHashMap[AnyRef, java.lang.Long]()
  private var localRelSeq = 0L
  private def localRelId(data: AnyRef): Long = localRelIds.synchronized {
    val got = localRelIds.get(data)
    if (got != null) got.longValue()
    else {
      if (localRelIds.size > 1024) localRelIds.clear()
      localRelSeq += 1
      localRelIds.put(data, localRelSeq)
      localRelSeq
    }
  }

  def clearCodebookCache(): Unit = codebookCache.clear()

  /** Number of actual Lloyd's trainings this JVM ran (test observability
    * for the memo/persistence layers).
    */
  private[ml] val trainCount = new java.util.concurrent.atomic.AtomicLong()

  /** Cross-session codebook persistence: the in-memory memo above dies with
    * the JVM, so a serving deployment that restarts per batch would retrain
    * Lloyd's every time. This variant completes the pattern: the caller
    * names the corpus durably (`corpusKey`, e.g. "<table path>@<snapshot
    * id>" from the snapshot store — the same identity discipline as the
    * plan-keyed memo, but restart-stable), and the trained codebook is
    * stored as JSON under `cacheDir`. Lookup order: in-memory memo →
    * persisted file → train + atomic write (tmp + move, so a crashed writer
    * never leaves a torn file). Entries are nlist×dim floats (KBs).
    */
  def kmeansCodebookPersistent(corpus: DataFrame, cacheDir: java.nio.file.Path,
                               corpusKey: String, nlist: Int, iters: Int = 3,
                               sampleN: Int = 4096, idCol: String = "vec_id",
                               vecCol: String = "embedding"): Array[Array[Float]] = {
    import java.nio.file.{Files, StandardCopyOption}
    // an empty corpus name would make every same-config corpus hash to the
    // SAME persisted file — the second corpus silently serves the first's
    // codebook (the cross-corpus collision the plan-keyed memo was hardened
    // against). Persistence without a real identity is always a bug.
    require(corpusKey.nonEmpty,
      "corpusKey must durably name the corpus (e.g. \"<table path>@<snapshot id>\") " +
        "when persisting codebooks — an empty key collides every same-config corpus")
    val cfgKey = s"$corpusKey#$nlist#$iters#$sampleN#$idCol#$vecCol"
    codebookCache.computeIfAbsent(s"persist#$cfgKey", _ => {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(cfgKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val file = cacheDir.resolve(s"codebook-$digest.json")
      if (Files.exists(file)) {
        val parsed = org.json4s.jackson.JsonMethods.parse(Files.readString(file))
        implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
        parsed.extract[List[List[Float]]].map(_.toArray).toArray
      } else {
        val cb = kmeansCodebookUncached(corpus, nlist, iters, sampleN, idCol, vecCol)
        Files.createDirectories(cacheDir)
        val tmp = cacheDir.resolve(s".codebook-$digest.tmp")
        Files.writeString(tmp, org.json4s.jackson.Serialization.write(
          cb.map(_.toList).toList)(org.json4s.DefaultFormats))
        Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        cb
      }
    })
  }

  def kmeansCodebook(corpus: DataFrame, nlist: Int, iters: Int = 3,
                     sampleN: Int = 4096, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Array[Float]] = {
    val plan = corpus.queryExecution.analyzed
    // LocalRelation's string form EXCLUDES its data and canonicalization
    // normalizes attribute names — two different in-memory corpora with the
    // same schema would otherwise collide and the second would silently get
    // the first's codebook. Pin each local relation by the IDENTITY of its
    // data via the registry above (same DataFrame ⇒ hit; a different or
    // re-built local corpus ⇒ miss — conservative but never wrong).
    // File-backed relations carry their location in the canonical form
    // already.
    val localIds = plan.collect {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        localRelId(lr.data)
    }.mkString(",")
    val key = s"${plan.canonicalized}#local[$localIds]#$nlist#$iters#$sampleN#$idCol#$vecCol"
    codebookCache.computeIfAbsent(key, _ =>
      kmeansCodebookUncached(corpus, nlist, iters, sampleN, idCol, vecCol))
  }

  private def kmeansCodebookUncached(corpus: DataFrame, nlist: Int, iters: Int,
                                     sampleN: Int, idCol: String,
                                     vecCol: String): Array[Array[Float]] = {
    trainCount.incrementAndGet()
    // ONE distributed job: the deterministic hash-sample, sorted on
    // (h, tie) — (h, tie) not bare h: equal hashes would otherwise make the
    // selected sample — and the codebook — partition-order dependent
    // (determinism rule: ordering comes from data, never task scheduling).
    // Lloyd's then runs DRIVER-SIDE over the collected sample: sampleN×dim
    // floats is ~1 MB at the defaults (bounded regardless of corpus size —
    // this is the same "driver holds only the sketch" contract as the
    // nlist×dim codebook itself), and iterating in sorted sample order
    // keeps the arithmetic deterministic. The previous per-iteration
    // assignment+posexplode+groupBy Spark jobs (~2 jobs × iters over a
    // 4096-row table) were pure scheduling latency.
    val sample: Array[Array[Float]] = corpus
      .select(col(vecCol).as("vec"), xxhash64(col(idCol)).as("h"), col(idCol).as("tie"))
      .orderBy("h", "tie").limit(sampleN).select("vec")
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "corpus must be non-empty")
    // seed centroids = the nlist hash-smallest corpus vectors — a PREFIX of
    // the same sorted sample (identical selection to sampledCodebook)
    var codebook = sample.take(nlist).map(_.clone())
    if (iters <= 0) return codebook
    val dim = sample(0).length
    for (_ <- 0 until iters) {
      val sums = Array.fill(codebook.length)(new Array[Double](dim))
      val counts = new Array[Long](codebook.length)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < codebook.length) {
          var d = 0.0d
          var i = 0
          val cen = codebook(c)
          while (i < dim) { val t = v(i).toDouble - cen(i); d += t * t; i += 1 }
          // strict < keeps the lowest-index cell on ties (matches the
          // rankedCells array_sort tie-break on (dist, cell))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      codebook = codebook.indices.map { c =>
        if (counts(c) == 0) codebook(c) // empty cell keeps its centroid
        else {
          val out = new Array[Float](dim)
          var i = 0
          while (i < dim) { out(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          out
        }
      }.toArray
    }
    codebook
  }

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` cells by
    * nearest centroid; a query exact-ranks only the `nprobe` nearest cells.
    * The codebook is k-means-trained on a hash-sample ([[kmeansCodebook]];
    * set kmeansIters=0 for the raw sampled codebook). Cell assignment is a
    * codegen'd argmin over literal centroid arrays — no UDF; the probe join
    * shuffles on cell id only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              kmeansIters: Int = 2, probeAll: Boolean = false,
              persistDir: Option[java.nio.file.Path] = None,
              corpusKey: String = ""): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    // persistDir + corpusKey (e.g. "<table path>@<snapshot id>") routes the
    // codebook through the cross-session store; default stays the
    // plan-keyed in-memory memo. corpusKey is REQUIRED with persistDir
    // (enforced in kmeansCodebookPersistent) — the default "" exists only
    // so memo-only callers need not invent a name.
    val codebook = persistDir match {
      case Some(d) => kmeansCodebookPersistent(corpus, d, corpusKey, nlist,
        kmeansIters, idCol = idCol, vecCol = vecCol)
      case None => kmeansCodebook(corpus, nlist, kmeansIters, idCol = idCol, vecCol = vecCol)
    }
    // probeAll = exact-equivalence configuration (every cell probed — output
    // equals brute force) expressed structurally, not by hardcoding a
    // number that silently decouples from the nlist default
    val effProbe = if (probeAll) nlist else nprobe

    // cell assignment and probe ranking run as the native nearest_cell /
    // ranked_cells expressions: the codebook rides as ONE Base64 literal
    // leaf instead of nlist×dim lit() nodes per use site (the former
    // ~10⁴-node rankedCells tree per corpus row dominated this operator's
    // planning AND evaluation; arithmetic and (dist, cell) tie-breaks are
    // bit-identical — MlSpec pins ivf == brute force)
    graft.functions.expressions.GraftFunctions.register(corpus.sparkSession)
    val cbB64 = graft.functions.expressions.VectorKernels.encodeMatrix(codebook)
    val cCells = corpus.select(c(idCol).as("neighbor_id"), c(vecCol).as("nvec"),
      call_function("nearest_cell", c(vecCol), lit(cbB64)).as("cell"))
    val qCells = queries.select(c(idCol).as("query_id"), c(vecCol).as("qvec"),
      explode(call_function("ranked_cells", c(vecCol), lit(cbB64),
        lit(math.min(effProbe, codebook.length)))).as("cell"))
    // no distinct: each corpus vector is assigned to exactly ONE cell and a
    // query's probed cells are distinct (slice of the ranked array), so a
    // (query, neighbor) pair can only meet once — the defensive distinct
    // was a full extra shuffle+agg of the scored pairs
    val scored = qCells.join(cCells, Seq("cell"))
      .filter(c("query_id") =!= c("neighbor_id"))
      .withColumn("cosine", cosineCol(c("qvec"), c("nvec")))
      .select(c("query_id"), c("neighbor_id"), c("cosine"))
    val w = Window.partitionBy(c("query_id")).orderBy(c("cosine").desc, c("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(c("rank") <= k)
      .select(c("query_id"), c("rank"), c("neighbor_id"), c("cosine"))
  }

  /** ANN top-k: bucket corpus and queries by hyperplane signature; probe the
    * exact bucket plus `probes` one-bit-flipped neighbors (multi-probe LSH);
    * exact-rank within the probed candidate set. Shuffle key = bucket id —
    * this is the plan that survives a 100× corpus: no |Q|×|N| term, only
    * |Q|×(avg bucket size)×(probes+1).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
              planes: Int = 8, probes: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              probeAll: Boolean = false): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
    val qSig = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("b0"))
    // multi-probe: original bucket + one-bit flips. probeAll probes every
    // bucket — the exact-equivalence configuration (output == brute force,
    // same bucket-join plan shape), which is what the DuckDB oracle checks;
    // recall of the approximate configs is covered by MlSpec.
    val probeBuckets =
      if (probeAll) sequence(lit(0), lit((1 << planes) - 1))
      else array((lit(0) +: (0 until math.min(probes, planes)).map(p => lit(1 << p))): _*)
    val q = qSig.select(col("query_id"), col("qvec"),
      explode(transform(probeBuckets, m => col("b0").bitwiseXOR(m))).as("bucket"))
    // no distinct: a corpus vector has exactly ONE bucket and the probe
    // masks are distinct (so the probed buckets are distinct) — a
    // (query, neighbor) pair meets on at most one probe
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qvec"), col("nvec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
