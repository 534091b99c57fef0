package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID
  * (n-gram/stopword heuristic), quality scoring, token counting, document
  * fingerprinting. All built from codegen'd builtins where possible; the
  * rolling-hash fingerprint is the one UDF (stateful loop).
  */
object TextAnalysis {

  /** Whitespace token count (split on single spaces, empties dropped). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, " "), t => t =!= ""))

  /** BPE-ish subword token estimate: alphabetic runs + digit runs + any
    * other non-space character each count as one token.
    */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Tiny per-language stopword lists for the heuristic language-ID. */
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "un"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "les", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "den", "ein"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /** Heuristic language ID: pick the language whose stopword list overlaps
    * the token set most (score ties break to the lexicographically-last
    * language via struct ordering); zero evidence → "und" (undetermined).
    */
  def langIdHeuristic(text: Column): Column = {
    val toks = array_distinct(split(lower(text), " "))
    val scores = StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality-score components (the standard cheap filters): length, mean
    * word length, stopword ratio, punctuation ratio, uppercase ratio.
    */
  def qualityComponents(text: Column): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val n = size(toks)
    val chars = length(text)
    val allStops = array(StopwordsByLang.values.flatten.toSeq.distinct.map(lit): _*)
    val nStop = size(array_intersect(array_distinct(transform(toks, t => lower(t))), allStops))
    val punct = chars - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val upper = chars - length(regexp_replace(text, "[A-Z]", ""))
    struct(
      n.as("n_tokens"),
      chars.as("n_chars"),
      nStop.as("n_stopword_types"),
      punct.as("n_punct"),
      upper.as("n_upper"),
      (chars.cast("double") / greatest(n, lit(1))).as("mean_token_len"))
  }

  /** Composite quality score in [0,1]: the mix of heuristics a pretraining
    * cleaner would use (doc length band, stopword evidence, low punctuation
    * noise). Deterministic, no model.
    */
  def qualityScore(text: Column): Column = {
    val c = qualityComponents(text)
    val lenOk = when(c.getField("n_tokens").between(5, 100000), 1.0d).otherwise(0.0d)
    val stopOk = when(c.getField("n_stopword_types") >= 1, 1.0d).otherwise(0.0d)
    val punctRatio = c.getField("n_punct").cast("double") /
      greatest(c.getField("n_chars"), lit(1)).cast("double")
    val punctOk = when(punctRatio <= 0.2d, 1.0d).otherwise(0.0d)
    (lenOk + stopOk + punctOk) / lit(3.0d)
  }

  /** Gopher-style hard quality gates (Rae et al. 2021, appendix A —
    * adapted to the rule subset this corpus' fields can express): word
    * count band, mean word length band, symbol-to-character ratio cap,
    * stopword evidence. Emits the metrics AND the keep verdict so a
    * pipeline can either filter or audit the shed set. All codegen'd
    * builtins with SQL-replicable arithmetic (integer counts, double
    * ratios) — DuckDB-oracleable.
    */
  def gopherGates(text: Column): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val n = size(toks)
    val wordChars = aggregate(transform(toks, t => length(t)), lit(0), (a, b) => a + b)
    val meanWordLen = wordChars.cast("double") / greatest(n, lit(1))
    val chars = length(text)
    val symbols = chars - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    val symbolRatio = symbols.cast("double") / greatest(chars, lit(1))
    val allStops = array(StopwordsByLang.values.flatten.toSeq.distinct.map(lit): _*)
    val nStop = size(array_intersect(array_distinct(transform(toks, t => lower(t))), allStops))
    struct(
      n.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      nStop.as("n_stop_types"),
      (n.between(50, 100000) && meanWordLen.between(3.0d, 10.0d) &&
        (symbolRatio <= 0.1d) && (nStop >= 2)).as("keep"))
  }

  /** Within-document repetition metrics (the other half of the Gopher rule
    * set): word-n-gram counts, distinct counts, and the duplicate fraction
    * — heavily repeated n-grams mark boilerplate/spam. Pure array builtins,
    * DuckDB-replicable.
    */
  def repetitionMetrics(text: Column, n: Int = 2): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val total = size(grams)
    val distinct = size(array_distinct(grams))
    struct(
      total.as("n_grams"),
      distinct.as("n_distinct"),
      when(total > 0, lit(1.0d) - distinct.cast("double") / total)
        .otherwise(lit(0.0d)).as("dup_frac"))
  }

  /** Fixed-size training-window chunking with stride overlap: the
    * pack-into-context-windows op every pretraining pipeline ends with.
    * Emits one array entry per chunk of `size` word tokens starting every
    * `stride` tokens (the final partial window is kept iff non-empty);
    * callers explode it into (doc_id, chunk_idx, chunk_text) rows. Pure
    * array builtins — chunking never shuffles, it rides the scan.
    */
  def chunkWindows(text: Column, size: Int, stride: Int): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val n = org.apache.spark.sql.functions.size(toks)
    val nChunks = ceil((greatest(n, lit(1)).cast("double") - size) / stride).cast("int") + 1
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(size)))))
  }

  /** Greedy sequence packing: the training-batch construction step that
    * follows chunking — walk documents in a deterministic order and pack
    * them into bins of `capacity` whitespace tokens (next-fit: a doc that
    * would overflow the current bin CLOSES it and opens a new one — closed
    * bins are never revisited; a doc longer than the capacity gets a bin of
    * its own). The walk order is
    * doc_id within (source, salt) streams, with salt = doc_id mod
    * `saltBuckets` — order comes from data, never task scheduling, so the
    * packing is bit-stable across runs and parallelism levels.
    *
    * Scale contract: one shuffle (the groupBy); each group's (doc_id,
    * n_tokens) pairs — 12 bytes/doc, never the text — are collected into an
    * array for the sequential inner loop, which runs as the native
    * codegen'd `greedy_pack` expression. Choose saltBuckets ≈ corpusRows /
    * targetGroupSize to bound per-group memory at scale (the same
    * caller-sized contract as the ANN plane count); packing quality is
    * per-stream, so more streams trade a little fill efficiency for
    * parallelism.
    *
    * Returns one row per packed bin: (source, salt, bin_id, n_docs,
    * n_tokens), bin_id dense from 0 within its (source, salt) stream.
    */
  def packBins(docs: org.apache.spark.sql.DataFrame, capacity: Int,
               saltBuckets: Int): org.apache.spark.sql.DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    graft.functions.expressions.GraftFunctions.register(docs.sparkSession)
    val salted = docs.select(col("source"),
      pmod(col("doc_id"), lit(saltBuckets.toLong)).cast("int").as("salt"),
      struct(col("doc_id"),
        coalesce(tokenCount(col("text")), lit(0)).as("n")).as("dt"))
    salted.groupBy(col("source"), col("salt"))
      .agg(sort_array(collect_list(col("dt"))).as("dts"))
      .select(col("source"), col("salt"),
        posexplode(expr(s"greedy_pack(transform(dts, d -> d.n), $capacity)"))
          .as(Seq("bin_id", "bin")))
      .select(col("source"), col("salt"), col("bin_id"),
        col("bin.n_docs").as("n_docs"), col("bin.n_tokens").as("n_tokens"))
  }

  /** PII patterns (RE2-compatible — no lookaround — so the DuckDB oracle
    * replays them verbatim): the email/phone scrub every released corpus
    * runs. Counts + redacted text, all codegen'd regexp builtins.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phones"))

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Winnowing fingerprint set: k-gram rolling hashes, minimum per window w
    * (Schleimer/Wilkerson/Aiken, SIGMOD 2003) — the near-dup fingerprint.
    * Gram hash = the same base-257 polynomial as the document fingerprint
    * (a true rolling hash, and pure integer arithmetic — DuckDB-oracleable,
    * unlike a seeded murmur3 gram hash). A native codegen'd expression
    * (graft.functions.expressions.WinnowingFingerprintsExpr, registered as
    * `winnow_fingerprints(text, k, w)`), not a UDF — the whole fingerprint
    * family now stays inside whole-stage codegen. Callers must have run
    * GraftFunctions.register(spark) (idempotent).
    */
  def winnowingFingerprints(textCol: String, k: Int, w: Int): Column =
    expr(s"winnow_fingerprints(`$textCol`, $k, $w)")
}
