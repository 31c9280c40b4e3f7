package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector-shaped array kernels for the embedding operators
  * (operators/Embeddings). Both exist for the same reason as DotProduct:
  * the HOF formulation `transform(vec, x -> x * scalar)` has its scalar
  * operand inlined by CollapseProject into the lambda body, where it is
  * re-evaluated PER ELEMENT — an O(d) norm becomes O(d²) per row. Here
  * the scalar operands are ordinary expression children, evaluated once
  * per row, and the element loop is a tight codegen'd primitive loop.
  *
  * Element-null semantics match DotProduct: a null element nulls the
  * whole result (embeddings are dense; per-element null propagation
  * would just defer the failure).
  */

/** `array<numeric> * scalar` in double space (cudf binary-op broadcast
  * of a scalar over a column, cpp/include/cudf/binaryop.hpp — the
  * column-vs-scalar case specialized to vector math). */
case class ArrayScale(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }) && right.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_scale needs (numeric array, double), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
  }

  override def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val k = s.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = get(arr, i) * k
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def accessor(arr: String, i: String): String = elemType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
      int $n = $a.numElements();
      double[] $out = new double[$n];
      for (int $i = 0; $i < $n; $i++) {
        if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        $out[$i] = ${accessor(a, i)} * $s;
      }
      if (!${ev.isNull}) {
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }
      """
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ArrayScale = copy(left = l, right = r)
}

/** Affine uint8 quantization of a numeric array: each element maps to
  * `clamp(floor((x - lo) / scale), 0, 255)` (scale == 0, the constant
  * vector, maps to all zeros). The inverse is `lo + (q + 0.5) * scale`.
  * This is the standard per-vector scalar quantization step for
  * embedding storage (4× smaller than float32); lo/scale are per-row
  * scalar children, evaluated once. */
case class ArrayQuantizeU8(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }) && second.dataType == DoubleType && third.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_quantize_u8 needs (numeric array, double lo, double scale), " +
        s"got ${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  private def get(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
  }

  override def nullSafeEval(a: Any, loV: Any, scaleV: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val lo = loV.asInstanceOf[Double]
    val scale = scaleV.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) =
        if (scale == 0.0) 0
        else math.min(math.max(
          math.floor((get(arr, i) - lo) / scale), 0.0), 255.0).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def accessor(arr: String, i: String): String = elemType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, lo, scale) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
      int $n = $a.numElements();
      int[] $out = new int[$n];
      for (int $i = 0; $i < $n; $i++) {
        if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        $out[$i] = ($scale == 0.0d) ? 0
          : (int) java.lang.Math.min(java.lang.Math.max(
              java.lang.Math.floor((${accessor(a, i)} - $lo) / $scale),
              0.0d), 255.0d);
      }
      if (!${ev.isNull}) {
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }
      """
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): ArrayQuantizeU8 = copy(first = f, second = s, third = t)
}
