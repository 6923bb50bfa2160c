package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native float-vector kernel backing every cosine in the ANN/SemDeDup ops.
  *
  * The HOF formulation it replaces — `aggregate(zip_with(x, y, a·b), 0, +)`
  * — evaluates an interpreted lambda per ELEMENT per pair (ArrayAggregate
  * does not participate in codegen), which dominated q64's within-cluster
  * pair mining (~6M pairs × 64 dims at sf0.1). The kernel is one generated
  * static call per pair with a primitive while-loop inside.
  *
  * Bit-parity contract (gated in VectorKernelsSpec and by the q30–q33/q64
  * oracles + pins staying green): float→double widening per element, one
  * double multiply, left-to-right double accumulation — the exact IEEE
  * operation sequence of the HOF fold, so every cosine in the repo is
  * unchanged to the last ulp. Inputs must be equal-length non-null
  * `array<float>` (every embedding column in the repo; on length mismatch
  * the shorter length wins rather than the HOF's null). */
object VectorKernel {
  def dotF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** `float_dot(x, y)` → double. */
case class FloatDotExpression(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "float_dot"

  override def nullSafeEval(x: Any, y: Any): Any =
    VectorKernel.dotF(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorKernel$$.MODULE$$.dotF($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotExpression =
    copy(left = newLeft, right = newRight)
}
