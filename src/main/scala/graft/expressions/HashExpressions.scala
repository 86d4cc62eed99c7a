package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd portable-hash kernels (SURVEY.md §7.4 path (b)).
  *
  * The portable 60/28-bit hashes are DEFINED as hex-prefix reads of the MD5
  * digest (`graft.functions.HashFunctions`): any engine replays them via
  * `md5()` + hex parsing, which is what the DuckDB oracles do. The built-in
  * formulation (`conv(substring(md5(x), ..), 16, 10)`) round-trips every row
  * through a 32-char hex string, a substring copy, and a radix parse — pure
  * overhead for values that are just bit-slices of the digest. These
  * expressions compute the identical values directly from the digest bytes
  * (equality pinned in HashExpressionsSpec against both the built-in
  * formulation and hard-coded contract values):
  *
  *  - hex digits 1..15  = bytes 0..6 plus the high nibble of byte 7 → h60
  *  - hex digits 16..22 = low nibble of byte 7 plus bytes 8..10     → h28
  */
trait PortableHashExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  /** Java source computing this hash's long from a `byte[16]` digest var. */
  protected def sliceJava(d: String): String
  protected def sliceEval(d: Array[Byte]): Long

  override def nullSafeEval(input: Any): Any =
    sliceEval(PortableHashExpression.digest(
      input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "portableMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      s"""
         |byte[] $d = $md.digest($c.getBytes());
         |${ev.value} = ${sliceJava(d)};
       """.stripMargin
    })
  }
}

object PortableHashExpression {
  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def digest(bytes: Array[Byte]): Array[Byte] = localMd5.get().digest(bytes)

  def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }
  def h28(d: Array[Byte]): Long =
    ((d(7) & 0x0FL) << 24) | ((d(8) & 0xFFL) << 16) |
      ((d(9) & 0xFFL) << 8) | (d(10) & 0xFFL)

  /** Second 60-bit slice: hex digits 17..31 (bytes 8..14 + the high nibble
    * of byte 15) — a full-width companion to [[h60]] for seeded families.
    */
  def h60b(d: Array[Byte]): Long = {
    var v = 0L
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(15) & 0xF0L) >>> 4)
  }
}

/** First 15 hex digits of MD5 as a non-negative long (== portableHash60). */
case class PortableHash60(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_hash60"
  override protected def sliceJava(d: String): String = {
    // byte i of the digest lands at bits [59-8i .. 52-8i]; byte 7's high
    // nibble fills bits [3..0]
    val first7 = (0 until 7)
      .map(i => s"((long)($d[$i] & 0xFF) << ${8 * (6 - i) + 4})")
      .mkString(" | ")
    s"$first7 | ((long)($d[7] & 0xF0) >>> 4)"
  }
  override protected def sliceEval(d: Array[Byte]): Long =
    PortableHashExpression.h60(d)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hex digits 17..31 of MD5 as a second full-width 60-bit long — the seeded
  * family's step (`portableSeededHash`). Full width matters: a narrow step
  * cannot reorder values spread over the 60-bit range (the degenerate-family
  * lesson in TextSignatures.minhash's scaladoc).
  */
case class PortableHash60B(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_hash60b"
  override protected def sliceJava(d: String): String = {
    val first7 = (8 until 15)
      .map(i => s"((long)($d[$i] & 0xFF) << ${8 * (14 - i) + 4})")
      .mkString(" | ")
    s"$first7 | ((long)($d[15] & 0xF0) >>> 4)"
  }
  override protected def sliceEval(d: Array[Byte]): Long =
    PortableHashExpression.h60b(d)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BOTH full-width 60-bit slices from ONE digest, as `struct<h1, h2>` —
  * for consumers that feed the seeded probe family (Bloom positions, band
  * hashes) and would otherwise run [[PortableHash60]] and
  * [[PortableHash60B]] as two separate expressions, each paying its own
  * MD5 over the same string. Catalyst cannot merge those two digests
  * (different expression trees), so the fusion has to be explicit.
  */
case class PortableHash60Pair(child: Expression) extends UnaryExpression {
  override def prettyName: String = "portable_hash60_pair"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val d = PortableHashExpression.digest(input.asInstanceOf[UTF8String].getBytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](PortableHashExpression.h60(d), PortableHashExpression.h60b(d)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "portableMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    val rowClass =
      classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      val h1 = (0 until 7)
        .map(i => s"((long)($d[$i] & 0xFF) << ${8 * (6 - i) + 4})")
        .mkString(" | ") + s" | ((long)($d[7] & 0xF0) >>> 4)"
      val h2 = (8 until 15)
        .map(i => s"((long)($d[$i] & 0xFF) << ${8 * (14 - i) + 4})")
        .mkString(" | ") + s" | ((long)($d[15] & 0xF0) >>> 4)"
      s"""
         |byte[] $d = $md.digest($c.getBytes());
         |${ev.value} = new $rowClass(new Object[] {
         |  java.lang.Long.valueOf($h1), java.lang.Long.valueOf($h2) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hex digits 16..22 of MD5 as a 28-bit long (== portableHash28). */
case class PortableHash28(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_hash28"
  override protected def sliceJava(d: String): String =
    s"((long)($d[7] & 0x0F) << 24) | ((long)($d[8] & 0xFF) << 16) | " +
      s"((long)($d[9] & 0xFF) << 8) | (long)($d[10] & 0xFF)"
  override protected def sliceEval(d: Array[Byte]): Long =
    PortableHashExpression.h28(d)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
