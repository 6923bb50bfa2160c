package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmin-assignment kernel for k-means (graft.ops.Kmeans).
  *
  * The HOF formulation it replaces — an `array(...)` of k independent
  * `aggregate(zip_with(q, cent, (a-b)²), 0, +)` folds followed by
  * `array_min` + `array_position` — evaluates k interpreted lambdas per row
  * (ArrayAggregate is CodegenFallback) and materializes a k-element distance
  * array nobody reads. The kernel is one generated static call per row with
  * a primitive k×dim double loop inside and no intermediate allocation
  * beyond the 2-field result row.
  *
  * Bit-parity contract (gated in VectorKernelsSpec and by the q63/q64/q69
  * oracles staying green): all arithmetic is exact Long — quantized
  * component diffs, squared, summed — identical to the integer HOF fold;
  * ties break to the LOWEST centroid index, exactly what
  * `array_position(dists, array_min(dists))` returns (first occurrence). */
object KmeansKernel {
  /** (cluster = argmin_j Σᵢ (q[i] − c[j][i])², dist_sq = the minimum). */
  def argminRow(q: ArrayData, cents: Array[Array[Long]]): InternalRow = {
    var best = 0
    var bestD = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(q.numElements(), c.length)
      var d = 0L
      var i = 0
      while (i < n) {
        val t = q.getLong(i) - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](best.toLong, bestD))
  }
}

/** `kmeans_argmin(q)` → struct<cluster:bigint, dist_sq:bigint> against the
  * literal centroid matrix baked into the expression (the fit loop re-plans
  * per iteration with fresh centroids — the plan stays flat, the Kmeans
  * scale contract). */
case class KmeansArgminExpression(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty, "kmeans_argmin needs at least one centroid")
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist_sq", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "kmeans_argmin"

  override def nullSafeEval(q: Any): Any =
    KmeansKernel.argminRow(q.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.plans.KmeansKernel$$.MODULE$$.argminRow($q, $centsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): KmeansArgminExpression =
    copy(child = newChild)
}
