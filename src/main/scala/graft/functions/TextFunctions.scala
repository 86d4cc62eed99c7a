package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale training-data pipeline
  * pack (driver brief; BASELINE.json north_star). All pure column
  * expressions — codegen'd, no UDFs — so they run at parquet-scan speed over
  * 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count estimate: tokens from a regex that splits words,
    * numbers, and individual punctuation — a deterministic stand-in for a real
    * tokenizer with the same column-level plumbing.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality-scoring feature struct: length, token count, mean word length,
    * punctuation ratio, digit ratio, uppercase ratio, stopword ratio.
    * Heuristics in the style of C4/Gopher quality filters.
    */
  def qualityFeatures(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val uppers = length(regexp_replace(text, "[^A-Z]", "")).cast("double")
    val stop = stopwordCount(text, EnglishStopwords).cast("double")
    struct(
      len.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(len / greatest(nTok, lit(1.0)), 4).as("mean_word_len"),
      round(punct / greatest(len, lit(1.0)), 4).as("punct_ratio"),
      round(digits / greatest(len, lit(1.0)), 4).as("digit_ratio"),
      round(uppers / greatest(len, lit(1.0)), 4).as("upper_ratio"),
      round(stop / greatest(nTok, lit(1.0)), 4).as("stopword_ratio"))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
      "on", "with", "as", "was", "are", "at", "be", "this", "by", "an")

  /** Count of stopword occurrences (word-boundary, case-insensitive). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val pattern = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  }

  /** Language-ID heuristic: scores a text against per-language stopword sets
    * and returns the argmax label, 'und' when nothing matches. N-gram-free but
    * same shape as a real n-gram LID: a broadcastable rule table evaluated as
    * one expression per language.
    */
  def langIdHeuristic(text: Column): Column = {
    val langs: Seq[(String, Seq[String])] = Seq(
      "en" -> EnglishStopwords,
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
      "es" -> Seq("el", "la", "los", "las", "es", "una", "por", "con", "para", "como"))
    val scored = langs.map { case (code, words) =>
      struct(stopwordCount(text, words).as("score"), lit(code).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Normalized text for fingerprinting/dedup: lowercase, collapse whitespace,
    * strip non-alphanumerics (standard near-dup canonicalization).
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** JVM twin of [[normalizeForDedup]] for imperative kernels
    * (`Vocab.encodeGreedy`): same regexes, `Locale.ROOT` lowering. NOTE:
    * Spark's SQL `lower()` slow path for non-ASCII strings lowercases under
    * the JVM DEFAULT locale, so `Locale.ROOT` here is only half the story —
    * the launcher pins `-Duser.language=en -Duser.country=US` (build.sbt)
    * to keep the two sides aligned; deployments must carry the same pin.
    */
  def normalizeForDedupJvm(text: String): String =
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9\\s]", " ")
      .replaceAll("\\s+", " ")
      .trim

  /** 64-bit document fingerprint: xxhash64 of the normalized text. Exact-dup
    * detection at 100 TB = groupBy on this 8-byte key instead of the full
    * text. Internal-only values (fast path) — when the fingerprint leaves the
    * engine, use [[portableFingerprint]].
    */
  def fingerprint64(text: Column): Column =
    xxhash64(normalizeForDedup(text))

  /** Portable document fingerprint: the engine-independent 60-bit MD5 hash
    * ([[HashFunctions.portableHash60]]) of the normalized text. Same dedup
    * semantics as [[fingerprint64]] but reproducible bit-for-bit by any other
    * system (a catalog, a verifier, a non-Spark consumer) — the right choice
    * when fingerprints are an exported artifact.
    */
  def portableFingerprint(text: Column): Column =
    HashFunctions.portableHash60(normalizeForDedup(text))

  /** Email/URL patterns for the standard pre-training PII scrub. Kept
    * RE2-compatible (no backrefs/lookaround) so ANY regex engine applies
    * the identical transformation — the scrub output is an exported
    * artifact, same discipline as the portable hashes.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern: String = "https?://[^\\s]+"

  /** Number of matches of `pattern` in the text (codegen'd). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Mask URLs then emails (URL first — its greedy tail could contain `@`).
    * Pure codegen'd regexp_replace chain; order is part of the contract.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")

  /** Fused distinct word n-gram set over an ALREADY-NORMALIZED text column
    * (one codegen pass per row; null when no complete gram) — see
    * graft.expressions.DistinctShingles. The map-only form of
    * [[shingles]]∘[[normalizeForDedup]]: use it wherever the token-set
    * table feeds a shuffle, so shingling itself never pays one.
    */
  def distinctShinglesFused(normalized: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DistinctShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(normalized), n))

  /** Word n-gram shingles of the normalized text (for MinHash / Jaccard). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(normalizeForDedup(text), " ")
    // transform over sliding offsets: shingle i = words[i..i+n)
    array_distinct(
      filter(
        transform(words, (_, i) =>
          when(i <= size(words) - n,
            concat_ws(" ", slice(words, i + 1, lit(n))))),
        s => s.isNotNull))
  }
}
