package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document MinHash signature (SURVEY.md §7.4 path (b)).
  *
  * The signature is a DOC-LOCAL computation: min over the document's word
  * n-grams of the portable double-hash family `h1 + i·h2`. The composed
  * shape (explode shingles → window lead → md5 → numHashes min-aggregates)
  * exists only because array lambdas evaluate interpreted — it pays a
  * window shuffle plus a grouped aggregate for values each document could
  * compute alone. This expression runs the whole loop in one pass per row;
  * value-equality with [[graft.operators.Dedup.minhashSignatures]] (and
  * therefore with the DuckDB oracles — the construction is unchanged) is
  * pinned in TextSignaturesSpec.
  *
  * Input must already be normalized (`TextFunctions.normalizeForDedup`) so
  * word splitting is a plain single-space scan and the normalization
  * semantics stay in exactly one (codegen'd, regex-based) place. Documents
  * with fewer than `shingleN` words yield null (the composed shape emits no
  * group for them).
  */
case class MinhashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 64, "numHashes in 1..64")
  require(shingleN > 0, "shingleN must be positive")

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = TextSignatures.minhash(
      input.asInstanceOf[UTF8String].toString, numHashes, shingleN)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = graft.expressions.TextSignatures.minhash(
         |  $c.toString(), $numHashes, $shingleN);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSignatures {
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MinHash signature of a NORMALIZED (single-space) document, or null when
    * it has fewer than `n` words. Exact construction of the composed shape:
    * per n-gram "w_i .. w_{i+n-1}", md5 → (h60, h28), seeds h60 + s·h28.
    */
  def minhash(normalized: String, numHashes: Int, n: Int): Array[Long] = {
    val words = normalized.split(' ')
    if (words.length < n) return null
    val md = localMd5.get()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val h1 = PortableHashExpression.h60(d)
      val h2 = PortableHashExpression.h28(d)
      var v = h1
      var s = 0
      while (s < numHashes) {
        if (v < mins(s)) mins(s) = v
        v += h2
        s += 1
      }
      i += 1
    }
    mins
  }
}
