package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom codegen'd vector kernels (SURVEY.md §7.4 path (b): a native
  * Catalyst `Expression` where the built-in operators can't express the
  * semantics *efficiently*).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product declaratively, but they evaluate INTERPRETED — each lambda step is
  * an `Expression.eval` call — and measured ~100× slower than generated code
  * on the ANN hot path (millions of candidate pairs × vector dim). These
  * expressions emit a tight primitive loop via `doGenCode`, keeping the whole
  * stage inside Tungsten codegen.
  *
  * Both Float and Double array elements are supported; mixed operands
  * accumulate in double. Arrays of different lengths dot over the common
  * prefix (callers align dims). Null array elements are not supported
  * (embedding columns are dense).
  */
trait VecBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true

  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def genGetter(e: Expression): (String, String) => String =
    elementType(e) match {
      case FloatType  => (arr, i) => s"((double) $arr.getFloat($i))"
      case DoubleType => (arr, i) => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(s"unsupported element $other")
    }

  protected def evalGetter(e: Expression): (ArrayData, Int) => Double =
    elementType(e) match {
      case FloatType  => (arr, i) => arr.getFloat(i).toDouble
      case DoubleType => (arr, i) => arr.getDouble(i)
      case other => throw new IllegalStateException(s"unsupported element $other")
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** Dot product over the common prefix of two numeric arrays → double. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = evalGetter(left)
    val gy = evalGetter(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += gx(x, i) * gy(y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = genGetter(left)
    val gy = genGetter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${gx(a, i)} * ${gy(b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `nTables` random-hyperplane LSH signatures of a vector in ONE fused
  * loop → array<long> of length nTables (explode to (table, bucket) rows).
  *
  * The composed formulation — nTables × nBits separate `VecDot`-against-
  * literal-plane trees summed into a signature — is semantically identical
  * but materializes 50–100 expression trees per bucketing projection: the
  * generated method blows past the whole-stage-codegen size limits and each
  * plane literal is re-fetched per row per tree. Here the plane matrix is a
  * single flattened float[] reference object ([(table·nBits + bit)·dim]
  * layout) and the signature loop is one tight kernel.
  *
  * Bit packing matches `VectorFunctions.simhashBucket`: bit i of table t's
  * signature = sign(v · plane[t·nBits+i]).
  */
case class VecSimhashBuckets(child: Expression, planes: Array[Float],
                             nTables: Int, nBits: Int, dim: Int)
    extends UnaryExpression {
  require(planes.length == nTables * nBits * dim,
    s"planes length ${planes.length} != $nTables*$nBits*$dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_simhash_buckets"
  override def nullIntolerant: Boolean = true

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elementType == FloatType
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var b = 0
      while (b < nBits) {
        val base = (t * nBits + b) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += planes(base + i) * x
          i += 1
        }
        if (s >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[]")
    val get = elementType match {
      case FloatType  => (arr: String, i: String) => s"((double) $arr.getFloat($i))"
      case DoubleType => (arr: String, i: String) => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(s"unsupported element $other")
    }
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    int $base = ($t * $nBits + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $planesRef[$base + $i] * ${get(v, i)};
         |    }
         |    if ($s >= 0) $sig |= (1L << $b);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity in one pass (dot, |a|, |b| in a single loop) → double;
  * null when either norm is zero (degenerate vector), matching the
  * higher-order-function formulation it replaces.
  */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  // result can be null even for non-null inputs (zero vectors)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = evalGetter(left)
    val gy = evalGetter(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = gx(x, i); val yv = gy(y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gx = genGetter(left)
    val gy = genGetter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${gx(a, i)};
         |  double $yv = ${gy(b, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom > 0) { ${ev.value} = $dot / $denom; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
