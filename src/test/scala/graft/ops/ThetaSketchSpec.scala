package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for the KMV/theta intersection sketch: bit-exact agreement with a
  * driver-side reference estimator (same hash, same θ, same two IEEE ops),
  * estimator accuracy on known overlaps, the disjoint and identical edge
  * cases, and partitioning independence. */
class ThetaSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val HexLen = 15
  private val M = math.pow(16.0, HexLen)

  private def h15(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, HexLen)

  /** The exact estimator contract, naively. */
  private def reference(a: Seq[String], b: Seq[String], k: Int): (String, Long, Double) = {
    val sa = a.distinct.map(h15).distinct.sorted.take(k)
    val sb = b.distinct.map(h15).distinct.sorted.take(k)
    val theta = Seq(sa.last, sb.last).min
    val c = sa.toSet.intersect(sb.toSet).count(_ < theta).toLong
    (theta, c, c.toDouble * M / java.lang.Long.parseLong(theta, 16).toDouble)
  }

  private def run(a: Seq[String], b: Seq[String], k: Int): (String, Long, Double) = {
    val r = ThetaSketch.intersectEstimate(a.toDF("x"), "x", b.toDF("x"), "x", k)
      .as[(Long, String, Long, Double)].collect()
    assert(r.length === 1)
    (r.head._2, r.head._3, r.head._4)
  }

  private def items(prefix: String, range: Range) = range.map(i => s"$prefix$i")

  test("bit-exact agreement with the reference estimator") {
    val a = items("e", 0 until 3000)
    val b = items("e", 1500 until 4500)
    assert(run(a, b, 64) === reference(a, b, 64))
    assert(run(a, b, 256) === reference(a, b, 256))
  }

  test("estimate lands near the true intersection (k=256, ~1/sqrt(k) error)") {
    val a = items("e", 0 until 5000)
    val b = items("e", 2500 until 7500)
    val (_, _, est) = run(a, b, 256)
    assert(math.abs(est - 2500.0) < 2500.0 * 0.35, s"est=$est vs true 2500")
  }

  test("disjoint sets estimate 0; identical sets estimate the cardinality") {
    val a = items("a", 0 until 2000)
    val (_, c0, est0) = run(a, items("b", 0 until 2000), 128)
    assert(c0 === 0L && est0 === 0.0)
    val (_, c1, est1) = run(a, a, 128)
    assert(c1 === 127L) // every sample entry is common; one sits AT theta
    assert(math.abs(est1 - 2000.0) < 2000.0 * 0.35, s"est=$est1 vs true 2000")
  }

  test("duplicate inputs do not move the estimate (set semantics)") {
    val a = items("e", 0 until 3000)
    val b = items("e", 1000 until 4000)
    assert(run(a ++ a, b ++ b.reverse, 128) === run(a, b, 128))
  }

  test("results are identical across input partitioning") {
    val a = items("e", 0 until 3000)
    val b = items("e", 1500 until 4500)
    val x = ThetaSketch.intersectEstimate(
        a.toDF("x").repartition(7), "x", b.toDF("x").repartition(3), "x", 64)
      .as[(Long, String, Long, Double)].collect().head
    assert((x._2, x._3, x._4) === reference(a, b, 64))
  }
}
