package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-phrase automaton over NORMALIZED text — the blocklist
  * primitive (toxicity / copyright / contamination phrase lists). Real
  * blocklists run 10⁴–10⁶ terms, where a regex alternation (the q88 scrub
  * shape) degrades to O(len · terms) per document and an equality join on
  * exploded n-grams can't express multi-word phrases of mixed length; the
  * automaton matches ALL terms in one O(len + hits) scan per document
  * regardless of dictionary size — the only shape that survives both a
  * 100 TB corpus and a six-figure dictionary.
  *
  * Whole-word semantics by construction: patterns and text are both padded
  * with single spaces (`" term "` searched in `" text "`), so a term matches
  * exactly at word boundaries of the single-spaced normalized text —
  * replayable by any engine as a position scan (the oracle's form).
  * Overlapping occurrences all count (`"batch batch batch"` contains
  * `"batch batch"` twice — the padded occurrences share the middle space,
  * which a left-to-right `replace` would miss).
  *
  * Construction is the textbook goto/fail/dict-suffix trie (Aho & Corasick
  * 1975, CACM 18(6)): per-node hash transitions, BFS failure links, and
  * dictionary-suffix links so reporting stays O(hits) instead of walking
  * every failure chain. Build cost O(Σ|term|); one automaton per distinct
  * dictionary per executor (content-keyed cache — codegen instances share
  * it across partitions).
  */
final class AhoCorasick private (
    val terms: Array[String], // original (unpadded) terms, input order
    trans: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Int], // pattern index ending at node, -1 if none
    dict: Array[Int]) { // nearest proper-suffix node that is a pattern end, 0 = none

  /** Per-term occurrence counts (input order) in `" text "`. */
  def hitCounts(text: String): Array[Int] = {
    val counts = new Array[Int](terms.length)
    var s = 0
    var i = -1 // -1 = the leading pad space
    val n = text.length
    while (i <= n) {
      val c: Character = if (i < 0 || i == n) ' ' else text.charAt(i)
      while (s != 0 && !trans(s).containsKey(c)) s = fail(s)
      val nx = trans(s).get(c)
      s = if (nx == null) 0 else nx.intValue()
      if (out(s) >= 0) counts(out(s)) += 1
      var d = dict(s)
      while (d != 0) { counts(out(d)) += 1; d = dict(d) }
      i += 1
    }
    counts
  }

  /** Replace every matched TERM span (pad spaces excluded) with `mask`,
    * overlapping/abutting spans merged first — the excision twin of
    * [[hitCounts]] (the q115 span-removal discipline applied to
    * dictionary matches). Text must be normalized; a normalized-alphabet
    * mask keeps the output normalized, so scrubbing is idempotent.
    */
  def scrub(text: String, mask: String): String = {
    val n = text.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]() // exclusive, text coords
    var s = 0
    var i = -1
    while (i <= n) {
      val c: Character = if (i < 0 || i == n) ' ' else text.charAt(i)
      while (s != 0 && !trans(s).containsKey(c)) s = fail(s)
      val nx = trans(s).get(c)
      s = if (nx == null) 0 else nx.intValue()
      // a padded pattern " t " of length P ending at step i covers term
      // chars at steps i-P+2 .. i-1 == text coords (step j reads text[j]);
      // the span end (exclusive) is therefore i
      if (out(s) >= 0) {
        val p = terms(out(s)).length + 2
        starts.add(i - p + 2); ends.add(i)
      }
      var d = dict(s)
      while (d != 0) {
        val p = terms(out(d)).length + 2
        starts.add(i - p + 2); ends.add(i)
        d = dict(d)
      }
      i += 1
    }
    if (starts.isEmpty) return text
    // sort by start (ends arrive ordered, starts may not for mixed lengths)
    val m = starts.size()
    val idxs = (0 until m).sortBy(starts.get(_).intValue()).toArray
    val sb = new java.lang.StringBuilder(n)
    var pos = 0
    var k = 0
    while (k < m) {
      var st = starts.get(idxs(k)).intValue()
      var en = ends.get(idxs(k)).intValue()
      // merge overlapping/abutting spans
      while (k + 1 < m && starts.get(idxs(k + 1)).intValue() <= en) {
        en = math.max(en, ends.get(idxs(k + 1)).intValue())
        k += 1
      }
      if (st > pos) sb.append(text, pos, st)
      sb.append(mask)
      pos = math.max(pos, en)
      k += 1
    }
    if (pos < n) sb.append(text, pos, n)
    sb.toString
  }
}

object AhoCorasick {

  /** Build from UNPADDED normalized terms (distinct, non-empty). */
  def build(terms: Array[String]): AhoCorasick = {
    require(terms.nonEmpty, "blocklist must be non-empty")
    require(terms.toSet.size == terms.length, "blocklist terms must be distinct")
    require(terms.forall(t => t.nonEmpty && t.trim == t && !t.contains("  ")),
      "terms must be normalized (non-empty, single-spaced, trimmed)")
    val trans = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(-1)
    terms.zipWithIndex.foreach { case (t, idx) =>
      val p = " " + t + " "
      var s = 0
      var i = 0
      while (i < p.length) {
        val c: Character = p.charAt(i)
        val nx = trans(s).get(c)
        if (nx == null) {
          trans += new java.util.HashMap[Character, Integer]()
          outB += -1
          trans(s).put(c, trans.length - 1)
          s = trans.length - 1
        } else s = nx.intValue()
        i += 1
      }
      outB(s) = idx
    }
    val n = trans.length
    val fail = new Array[Int](n)
    val dict = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Integer]()
    trans(0).forEach((_, v) => { fail(v) = 0; queue.add(v); () })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      dict(u) = if (outB(fail(u)) >= 0) fail(u) else dict(fail(u))
      trans(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !trans(f).containsKey(c)) f = fail(f)
        val nf = trans(f).get(c)
        fail(v) = if (nf != null && nf.intValue() != v.intValue()) nf.intValue() else 0
        queue.add(v)
        ()
      }
    }
    new AhoCorasick(terms.clone(), trans.toArray, fail, outB.toArray, dict)
  }

  // content-keyed executor-wide cache: codegen instances (one per partition)
  // share the build; the key is the exact term sequence
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.util.List[String], AhoCorasick]()

  def forTerms(terms: Array[String]): AhoCorasick =
    cache.computeIfAbsent(java.util.Arrays.asList(terms: _*),
      _ => build(terms))

  /** Shared eval kernel: `array<struct<term, n_hits>>` of HIT terms only,
    * ordered by term — null-safe wrapper lives in the expression.
    */
  def hitsArray(ac: AhoCorasick, text: UTF8String, sortedIdx: Array[Int])
      : ArrayData = {
    val counts = ac.hitCounts(text.toString)
    var nHit = 0
    var i = 0
    while (i < counts.length) { if (counts(i) > 0) nHit += 1; i += 1 }
    val rows = new Array[Any](nHit)
    var k = 0
    i = 0
    while (i < sortedIdx.length) {
      val idx = sortedIdx(i)
      if (counts(idx) > 0) {
        rows(k) = new GenericInternalRow(Array[Any](
          UTF8String.fromString(ac.terms(idx)), counts(idx)))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** `array<struct<term string, n_hits int>>` of blocklist terms found as
  * whole-word phrases in an ALREADY-NORMALIZED text column, ordered by term;
  * empty array when nothing matches, null on null input. See [[AhoCorasick]]
  * for semantics and the scale argument.
  */
case class BlocklistHits(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "blocklist must be non-empty")

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "blocklist_hits"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  private def termsArray: Array[String] = terms.toArray
  @transient private lazy val ac = AhoCorasick.forTerms(termsArray)
  @transient private lazy val sortedIdx: Array[Int] =
    terms.indices.sortBy(terms).toArray

  override def nullSafeEval(input: Any): Any =
    AhoCorasick.hitsArray(ac, input.asInstanceOf[UTF8String], sortedIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsArray, "java.lang.String[]")
    val idxRef = ctx.addReferenceObj("sortedIdx", sortedIdx, "int[]")
    val acField = ctx.addMutableState("graft.expressions.AhoCorasick", "blocklistAc",
      v => s"$v = graft.expressions.AhoCorasick.forTerms($termsRef);")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.AhoCorasick.hitsArray(
       |  $acField, $c, $idxRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** NORMALIZED text with every blocklist-term span replaced by `mask`
  * (overlapping/abutting matches merged first) — see [[AhoCorasick.scrub]].
  * Null on null input; a clean document passes through unchanged.
  */
case class BlocklistScrub(child: Expression, terms: Seq[String], mask: String)
    extends UnaryExpression {
  require(terms.nonEmpty, "blocklist must be non-empty")

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "blocklist_scrub"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  private def termsArray: Array[String] = terms.toArray
  @transient private lazy val ac = AhoCorasick.forTerms(termsArray)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      ac.scrub(input.asInstanceOf[UTF8String].toString, mask))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsArray, "java.lang.String[]")
    val maskRef = ctx.addReferenceObj("mask", mask, "java.lang.String")
    val acField = ctx.addMutableState("graft.expressions.AhoCorasick", "scrubAc",
      v => s"$v = graft.expressions.AhoCorasick.forTerms($termsRef);")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  $acField.scrub($c.toString(), $maskRef));
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
