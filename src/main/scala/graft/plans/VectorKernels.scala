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

/** Native nearest-centroid kernel for the IVF coarse quantizer
  * (graft.ops.IvfIndex). Replaces an `array(...)` of nCentroids independent
  * `aggregate(zip_with(v, c, (a−b)²))` folds + `array_min` — interpreted
  * lambdas per row — with one generated static call.
  *
  * Bit-parity contract (gated by the q33 golden pin and IvfSpec): per
  * centroid, float→double widening per element, (a−b)² in double,
  * LEFT-TO-RIGHT double accumulation — the exact IEEE sequence of the HOF
  * fold; ties break to the LOWEST cell index, exactly what
  * `array_min(array(struct(d, cell)…))` returned (lexicographic struct
  * minimum). */
object IvfKernel {
  def nearestCell(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = v.getFloat(i).toDouble - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }
}

/** `ivf_nearest_cell(v)` → int against the literal centroid matrix. */
case class IvfNearestCellExpression(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty, "ivf_nearest_cell needs at least one centroid")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ivf_nearest_cell"

  override def nullSafeEval(v: Any): Any =
    IvfKernel.nearestCell(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.IvfKernel$$.MODULE$$.nearestCell($v, $centsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfNearestCellExpression =
    copy(child = newChild)
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
