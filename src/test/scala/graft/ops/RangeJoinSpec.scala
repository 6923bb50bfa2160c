package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the bin-and-verify range join: exact agreement with a
  * brute-force reference (including the half-open bounds), exactly-once pair
  * production for bin-spanning intervals, negative-axis floor binning,
  * bin-width invariance, empty-interval exclusion, the no-BNLJ plan shape,
  * and partitioning independence. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def reference(pts: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long, String)])
      : Set[(Long, Long, String)] =
    (for ((k, t) <- pts; (ik, s, e, id) <- ivs; if ik == k && t >= s && t < e)
      yield (k, t, id)).toSet

  private def run(pts: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long, String)],
                  bin: Long): Seq[(Long, Long, String)] =
    RangeJoin.pointInInterval(
        pts.toDF("k", "t"), ivs.toDF("k", "s", "e", "id"),
        Seq("k"), "t", "s", "e", binWidth = bin)
      .select("k", "t", "id").as[(Long, Long, String)].collect().toSeq

  private val ivs = Seq(
    (1L, 10L, 20L, "w1"),   // half-open [10, 20)
    (1L, 15L, 50L, "w2"),   // overlaps w1; spans several bins at bin=8
    (1L, 60L, 60L, "w0"),   // empty
    (2L, 0L, 5L, "w3"))
  private val pts = Seq(
    (1L, 9L), (1L, 10L), (1L, 15L), (1L, 19L), (1L, 20L), (1L, 49L), (1L, 50L),
    (2L, 0L), (2L, 4L), (2L, 5L), (3L, 12L))

  test("matches brute force; bounds are start-inclusive end-exclusive") {
    val got = run(pts, ivs, bin = 8L)
    assert(got.size === got.toSet.size, "a pair was produced more than once")
    assert(got.toSet === reference(pts, ivs))
    assert(got.toSet.contains((1L, 10L, "w1")) && !got.toSet.contains((1L, 20L, "w1")))
  }

  test("exactly-once across any bin width, including spans and tiny bins") {
    val want = reference(pts, ivs)
    for (bin <- Seq(1L, 3L, 8L, 64L, 1000L)) {
      val got = run(pts, ivs, bin)
      assert(got.size === got.toSet.size, s"dup pair at bin=$bin")
      assert(got.toSet === want, s"wrong pairs at bin=$bin")
    }
  }

  test("negative axis values bin with floor semantics") {
    val p = Seq((1L, -15L), (1L, -10L), (1L, -1L), (1L, 0L))
    val i = Seq((1L, -12L, 0L, "neg"))
    val got = run(p, i, bin = 8L)
    assert(got.toSet === reference(p, i))
    assert(got.toSet === Set((1L, -10L, "neg"), (1L, -1L, "neg")))
  }

  test("results are identical across input partitioning") {
    val a = run(pts, ivs, 8L).sorted
    val b = RangeJoin.pointInInterval(
        pts.toDF("k", "t").repartition(7), ivs.toDF("k", "s", "e", "id").repartition(3),
        Seq("k"), "t", "s", "e", 8L)
      .select("k", "t", "id").as[(Long, Long, String)].collect().toSeq.sorted
    assert(a === b)
  }

  test("plan shape: hash equi-join, never a nested-loop cartesian") {
    val df = RangeJoin.pointInInterval(
      pts.toDF("k", "t"), ivs.toDF("k", "s", "e", "id"),
      Seq("k"), "t", "s", "e", 8L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned as a cartesian:\n$plan")
  }
}
