package graft.ml

import graft.util.Hashing
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
    */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, t) => acc + t)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (brute force). The query
    * side is broadcast (it must be small); ties break on neighbor id so the
    * ranking is total and reproducible.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Random-hyperplane bucket signature (deterministic seeded planes). */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Long = 0xa117L): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dim).map(i =>
        lit(if (((Hashing.det(seed, p, i) >> 13) & 1L) == 1L) 1.0d else -1.0d)): _*)
      val dot = aggregate(zip_with(vec, plane, (a, b) => a.cast("double") * b),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce((a, b) => a + b)

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` cells by
    * nearest seeded centroid; a query exact-ranks only the `nprobe` nearest
    * cells. Centroids here are a deterministic corpus sample (IVF-flat with
    * sampled codebook — at real scale the codebook comes from k-means, the
    * assignment/probe plan is identical). Cell assignment is a codegen'd
    * argmin over literal centroid arrays — no UDF; the probe join shuffles
    * on cell id only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    // deterministic codebook: the nlist corpus vectors with smallest
    // hash(id) — a seeded sample, stable under partitioning
    import org.apache.spark.sql.functions.{col => c}
    val sampled = corpus
      .select(c(idCol).as("cid"), c(vecCol).as("cvec"), xxhash64(c(idCol)).as("h"))
      .orderBy("h").limit(nlist)
      .select("cid", "cvec").collect()
      .map(r => r.getSeq[Float](1).toArray)
    require(sampled.nonEmpty, "corpus must be non-empty")

    def distTo(vec: Column, centroid: Array[Float]): Column = {
      val lits = array(centroid.map(v => lit(v.toDouble)): _*)
      aggregate(zip_with(vec, lits, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0d), (acc, x) => acc + x)
    }
    /** cells ranked by distance: array of struct(dist, cell) sorted asc. */
    def rankedCells(vec: Column): Column =
      array_sort(array(sampled.zipWithIndex.map { case (cen, i) =>
        struct(distTo(vec, cen).as("dist"), lit(i).as("cell"))
      }: _*))

    val cCells = corpus.select(c(idCol).as("neighbor_id"), c(vecCol).as("nvec"),
      rankedCells(c(vecCol)).getItem(0).getField("cell").as("cell"))
    val qCells = queries.select(c(idCol).as("query_id"), c(vecCol).as("qvec"),
      explode(transform(slice(rankedCells(c(vecCol)), 1, math.min(nprobe, sampled.length)),
        s => s.getField("cell"))).as("cell"))
    val scored = qCells.join(cCells, Seq("cell"))
      .filter(c("query_id") =!= c("neighbor_id"))
      .withColumn("cosine", cosineCol(c("qvec"), c("nvec")))
      .select(c("query_id"), c("neighbor_id"), c("cosine")).distinct()
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
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
    val qSig = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneBucket(col(vecCol), dim, planes).as("b0"))
    // multi-probe: original bucket + one-bit flips
    val probeBuckets = array((lit(0) +: (0 until math.min(probes, planes)).map(p => lit(1 << p))): _*)
    val q = qSig.select(col("query_id"), col("qvec"),
      explode(transform(probeBuckets, m => col("b0").bitwiseXOR(m))).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineCol(col("qvec"), col("nvec")))
      .select(col("query_id"), col("neighbor_id"), col("cosine")).distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
