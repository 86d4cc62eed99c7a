package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing (SURVEY.md A7, §2.8 Hash/UUID).
  *
  * Reference: `dict_to_uuid` = MD5 over sorted key/value strings — param-set
  * hashes, stream hashes, config-change detection
  * (`aeon/dj_pipeline/utils/hashing.py:7-13`,
  * `utils/load_metadata.py:780-788`).
  */
object HashFunctions {

  /** MD5 hex of `k1=v1|k2=v2|...` with pairs pre-sorted by key — the
    * row-level analogue of `dict_to_uuid`. Pass (key, value) column pairs.
    */
  def dictUuid(pairs: (Column, Column)*): Column = {
    val entries = array(pairs.map { case (k, v) =>
      concat_ws("=", k.cast("string"), v.cast("string"))
    }: _*)
    md5(concat_ws("|", sort_array(entries)))
  }

  /** Aggregate form: MD5 over all (k, v) rows of a group, sorted — detects
    * device-config changes between epochs (`load_metadata.py:780-788`).
    * Use inside `groupBy(...).agg(configHash($"k", $"v"))`.
    */
  def configHash(k: Column, v: Column): Column =
    md5(concat_ws("|",
      sort_array(collect_list(concat_ws("=", k.cast("string"), v.cast("string"))))))

  /** PORTABLE 60-bit hash: the first 15 hex digits of MD5 as a non-negative
    * long. Engine-independent by construction — any system with md5 + hex
    * parsing reproduces it bit-for-bit (DuckDB:
    * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`), unlike xxhash64
    * whose seed/implementation is engine-specific. Use this whenever the hash
    * VALUE is part of the product surface (exported fingerprints, signatures
    * another system must verify); keep `xxhash64` for purely internal keys —
    * it is ~5× cheaper per byte and its values never leave the engine.
    *
    * Computed by a codegen'd kernel reading the digest bytes directly
    * (graft.expressions.PortableHash60) — the `conv(substring(md5(x)))`
    * formulation builds a 32-char hex string and radix-parses it per row;
    * HashExpressionsSpec pins both formulations equal.
    */
  def portableHash60(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.PortableHash60(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast("string"))))

  /** Second 28-bit portable hash from the same MD5 (hex digits 16..22) —
    * an extra independent slice when 60 bits aren't enough (e.g. widening a
    * fingerprint). NOT a double-hashing offset: `h60 + i·h28` looks like
    * Kirsch–Mitzenmacher but the 28-bit step can't reorder values spread
    * over a 60-bit range, so min-wise all "seeds" collapse to one function.
    * Seeded families use [[portableSeededHash]] instead.
    */
  def portableHash28(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.PortableHash28(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast("string"))))

  /** The second full-width 60-bit slice of the same MD5 (hex digits
    * 17..31) — the seeded family's step. */
  def portableHash60b(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.PortableHash60B(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast("string"))))

  /** The i-th member of the portable seeded family:
    * `(h60 + i·h60b) mod 2⁶⁰` — full-width Kirsch–Mitzenmacher, ONE md5 per
    * value for all seeds. The step must be FULL-width: a narrow step (the
    * h28 mistake) cannot reorder values spread over the 60-bit range and
    * the family collapses min-wise to a single function.
    *
    * The mod-2⁶⁰ arithmetic is written piecewise (split the step into
    * 30-bit halves) so every intermediate stays below 2⁶² — exact on any
    * engine's checked 64-bit integers, no ANSI overflow, no 128-bit types:
    * `(h1 + ((i·hi) mod 2³⁰)·2³⁰ + i·lo) AND (2⁶⁰−1)`.
    */
  def portableSeededHash(c: Column, i: Int): Column =
    portableSeededFromParts(portableHash60(c), portableHash60b(c), i)

  /** Both 60-bit slices from ONE md5 as `struct<h1, h2>` — for k-probe
    * consumers ([[graft.operators.Dedup.decontaminateBloom]]) that would
    * otherwise digest the same string twice via [[portableHash60]] +
    * [[portableHash60b]]. Feed the fields to [[portableSeededFromParts]].
    */
  def portableHashPair(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.PortableHash60Pair(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast("string"))))

  /** Same seeded member, but from ALREADY-COMPUTED `h60`/`h60b` columns —
    * lets a k-probe consumer (Bloom positions, band hashes) pay the two MD5
    * slices once per value instead of once per seed.
    */
  def portableSeededFromParts(h1: Column, h2: Column, i: Int): Column = {
    val hi = shiftright(h2, 30)
    val lo = h2.bitwiseAND(lit((1L << 30) - 1))
    (h1 + (lit(i.toLong) * hi % lit(1L << 30)) * lit(1L << 30) +
      lit(i.toLong) * lo).bitwiseAND(lit((1L << 60) - 1))
  }

  /** Fused per-document MinHash signature over an ALREADY-NORMALIZED text
    * column — see graft.expressions.MinhashSignature. Null when the doc has
    * fewer than `shingleN` words.
    */
  def minhashSignature(normalized: Column, numHashes: Int, shingleN: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinhashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(normalized),
        numHashes, shingleN))
}
