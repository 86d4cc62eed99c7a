package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Blocklist phrase matching over document text — the multi-phrase stage of
  * a curation pipeline (toxic/copyright/contamination term lists) between
  * the regex scrub (q88, a handful of patterns) and full decontamination
  * (q98/q120/q130, set/span similarity against a benchmark CORPUS): here
  * the dictionary is a flat phrase list, matching is exact whole-word, and
  * the list can be six figures long — which is why the engine side is one
  * Aho–Corasick scan per document ([[graft.expressions.BlocklistHits]],
  * O(len + hits) regardless of dictionary size) rather than a regex
  * alternation or a per-term join.
  *
  * Matching runs on `TextFunctions.normalizeForDedup` output with
  * whole-word padding; terms are normalized the same way at Column
  * construction (driver-side, once), so caller lists may be raw phrases.
  * All occurrences count, including overlapping ones.
  *
  * Scale shape: the dictionary is catalog-scale by definition; it ships to
  * executors once inside the plan (a string array reference, built into an
  * automaton once per executor via a content-keyed cache) — the corpus side
  * is MAP-ONLY, no join, no shuffle before the caller's own aggregation.
  */
object Blocklist {

  /** Normalize + validate a raw phrase list (driver-side). */
  private[graft] def normalizeTerms(terms: Seq[String]): Seq[String] = {
    val norm = terms.map(TextFunctions.normalizeForDedupJvm).filter(_.nonEmpty)
    require(norm.nonEmpty, "blocklist is empty after normalization")
    require(norm.distinct.size == norm.size,
      s"blocklist terms collide after normalization: ${
        norm.diff(norm.distinct).distinct.mkString(", ")}")
    norm
  }

  /** `array<struct<term, n_hits>>` column of blocklist hits in `text`
    * (ordered by term; empty when clean, null on null text).
    */
  def hits(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BlocklistHits(
        org.apache.spark.sql.GraftColumnBridge.expression(
          TextFunctions.normalizeForDedup(text)),
        normalizeTerms(terms)))

  /** Per-(doc, term) hit counts: `(idCol, term, n_hits)`, hit terms only. */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String]): DataFrame =
    docs.select(col(idCol), explode(hits(col(textCol), terms)).as("__h"))
      .select(col(idCol), col("__h.term").as("term"),
        col("__h.n_hits").cast("long").as("n_hits"))

  /** NORMALIZED text with every blocklist span replaced by `mask`
    * (overlapping/abutting matches merged) — the excision stage after
    * [[flag]] decides a document is worth keeping. A normalized-alphabet
    * mask (lowercase alphanumeric) keeps the output normalized, so the
    * scrub is idempotent and downstream dedup/tokenization see a
    * well-formed document. Map-only, like everything in this family.
    */
  def scrubbed(text: Column, terms: Seq[String],
               mask: String = "xxx"): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.BlocklistScrub(
        org.apache.spark.sql.GraftColumnBridge.expression(
          TextFunctions.normalizeForDedup(text)),
        normalizeTerms(terms), mask))

  /** Gate features, map-only: every input row plus `n_blocked_terms`
    * (distinct terms hit) and `n_blocked_hits` (total occurrences) —
    * the columns a quality gate thresholds on.
    */
  def flag(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame =
    docs
      .withColumn("__h", hits(col(textCol), terms))
      .withColumn("n_blocked_terms",
        coalesce(size(col("__h")), lit(0)).cast("long"))
      .withColumn("n_blocked_hits",
        coalesce(aggregate(col("__h"), lit(0),
          (acc, h) => acc + h.getField("n_hits")), lit(0)).cast("long"))
      .drop("__h")
}
