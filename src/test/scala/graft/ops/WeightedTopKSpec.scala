package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for Efraimidis–Spirakis weighted top-k sampling: bit-exact
  * agreement with a driver-side reference of the same draw/key formula,
  * weight-proportional selection pressure, the positive-weight contract,
  * and partitioning independence. */
class WeightedTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def u(id: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(h, 16).toDouble + 1.0) / math.pow(2.0, 60)
  }

  private def reference(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long, Long)] =
    rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, math.floor(math.log(u(id)) / w.toDouble * 1e9).toLong) }
      .sortBy { case (id, _, key) => (-key, id) }.take(k)
      .zipWithIndex.map { case ((id, w, key), i) => (id, w, key, i + 1L) }

  private def run(rows: Seq[(Long, Long)], k: Int, parts: Int = 3): Seq[(Long, Long, Long, Long)] =
    Sampling.weightedTopK(rows.toDF("doc_id", "w").repartition(parts), k, wCol = "w")
      .select("doc_id", "w", "key_fp", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)

  test("matches the driver-side reference bit-for-bit, ranks included") {
    val rows = (1L to 500L).map(i => i -> (i % 7 + 1))
    assert(run(rows, 25) === reference(rows, 25))
    assert(run(rows, 1) === reference(rows, 1))
  }

  test("selection pressure follows the weights") {
    // 100 heavy (w=1000) vs 900 light (w=1): top-50 should be mostly heavy
    val rows = (1L to 100L).map(_ -> 1000L) ++ (101L to 1000L).map(_ -> 1L)
    val got = run(rows, 50)
    assert(got === reference(rows, 50))
    val heavy = got.count(_._2 == 1000L)
    assert(heavy >= 40, s"expected heavy-weight domination, got $heavy/50")
  }

  test("non-positive weights are excluded from the draw") {
    val rows = Seq((1L, 5L), (2L, 0L), (3L, -1L), (4L, 5L))
    assert(run(rows, 10).map(_._1).toSet === Set(1L, 4L))
  }

  test("the sample is identical across input partitioning") {
    val rows = (1L to 300L).map(i => i -> (i % 13 + 1))
    assert(run(rows, 20, parts = 2) === run(rows, 20, parts = 11))
  }
}
