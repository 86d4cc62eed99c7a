package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit test against a BROADCAST bitset: `bits[p >> 6] >> (p & 63) & 1`.
  *
  * The probe side of the Bloom-screened decontamination path
  * (`graft.operators.Dedup.decontaminateBloom`): the bitset ships to each
  * executor ONCE as a torrent broadcast and the expression holds only the
  * broadcast HANDLE, so the serialized plan stays bytes-small no matter how
  * large the filter is — unlike embedding the array as a literal (re-shipped
  * with every task) or a UDF closure (opaque to codegen). The bit test
  * itself stays inside whole-stage codegen: two shifts and a mask per probe.
  *
  * The caller must bound positions to `[0, 64 * bits.length)` — probes are
  * produced by `% m` so this holds by construction; an out-of-range position
  * is a caller bug and fails loudly with the array-bounds error rather than
  * returning a wrong membership answer.
  */
case class BitsetContains(child: Expression, bits: Broadcast[Array[Long]])
  extends UnaryExpression {

  override def prettyName: String = "bitset_contains"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT bit position, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[Long]
    ((bits.value((p >>> 6).toInt) >>> (p & 63L)) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBits", bits,
      classOf[Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "bloomArr",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = (($arr[(int)($p >>> 6)] >>> ($p & 63L)) & 1L) == 1L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
