package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The float_dot kernel must be BIT-identical to the HOF fold it replaced —
  * same float→double widening, multiply, left-to-right accumulation — on
  * real embeddings and on adversarial values (denormals, huge/tiny mixes
  * where summation order matters). Also gates the codegen path (the parity
  * query runs inside whole-stage codegen) and the SQL registration. */
class VectorKernelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** The pre-kernel HOF formulation, kept verbatim as the reference. */
  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("float_dot equals the HOF fold bit-for-bit on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.crossJoin(emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
        .filter(col("id2") < 20))
      .select(
        graft.ops.Similarity.dot(col("embedding"), col("e2")).as("native"),
        hofDot(col("embedding"), col("e2")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float_dot matches on adversarial magnitudes (order-sensitive sums)") {
    val rows = Seq(
      (Seq(1e30f, 1f, -1e30f, 1f), Seq(1f, 1f, 1f, 1f)),
      (Seq(Float.MinPositiveValue, 1e-30f, 3.4e38f), Seq(1f, 1f, 1f)),
      (Seq(-0.0f, 0.0f, 1.5f), Seq(0.0f, -0.0f, 2.5f))
    ).toDF("x", "y")
      .select(col("x").cast("array<float>").as("x"), col("y").cast("array<float>").as("y"))
    val got = rows.select(graft.ops.Similarity.dot(col("x"), col("y")).as("n"),
      hofDot(col("x"), col("y")).as("h")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float_dot is registered as a SQL function") {
    GraftFunctions.registerKernels(spark)
    val v = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").collect()(0).getDouble(0)
    assert(v === 4.0)
  }

  test("null input yields null, like the HOF") {
    val df = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("x", "y")
      .select(col("x").cast("array<float>").as("x"), col("y").cast("array<float>").as("y"))
    val r = df.select(graft.ops.Similarity.dot(col("x"), col("y")).as("d")).collect()(0)
    assert(r.isNullAt(0))
  }
}
