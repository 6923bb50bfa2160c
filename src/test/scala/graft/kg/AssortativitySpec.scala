package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for degree assortativity: bit-exact agreement with an exact-
  * rational reference, the known disassortative star topology, edge
  * canonicalization, and partitioning independence. */
class AssortativitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Exact BigInt sums, the same final float expression. */
  private def reference(edges: Seq[(String, String)]): (Long, Double) = {
    val e = edges.distinct
    val od = e.groupBy(_._1).map { case (n, xs) => n -> BigInt(xs.size) }
    val id = e.groupBy(_._2).map { case (n, xs) => n -> BigInt(xs.size) }
    val xs = e.map { case (s, d) => (od(s), id(d)) }
    val m = BigInt(xs.size)
    val (sxy, sx, sy, sxx, syy) = xs.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))) {
      case ((a, b, c, d2, e2), (x, y)) => (a + x * y, b + x, c + y, d2 + x * x, e2 + y * y)
    }
    val (va, vb) = (m * sxx - sx * sx, m * syy - sy * sy)
    (m.toLong, if (va == 0 || vb == 0) 0.0
      else (m * sxy - sx * sy).toDouble / (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble)))
  }

  private def run(edges: Seq[(String, String)], parts: Int = 3): (Long, Double) = {
    val r = Assortativity.run(edges.toDF("src", "dst").repartition(parts))
      .as[(Long, Double)].collect()
    assert(r.length === 1)
    r.head
  }

  // mixed graph: a 3-cycle (assortative core) + a star (disassortative)
  private val mixed = Seq(
    "a" -> "b", "b" -> "c", "c" -> "a",
    "hub" -> "l1", "hub" -> "l2", "hub" -> "l3", "hub" -> "a")

  test("matches the exact-rational reference bit-for-bit") {
    assert(run(mixed) === reference(mixed))
  }

  test("a hub-dominated graph is disassortative; zero variance reports 0") {
    // hub (out-deg 4) pairs with in-deg-1 leaves; b's low-out edge hits the
    // in-deg-2 node -> negative correlation
    val star = Seq("h" -> "a", "h" -> "b", "h" -> "c", "h" -> "d", "b" -> "a")
    val (_, r) = run(star)
    assert(r === reference(star)._2)
    assert(r < -0.5, s"star should be disassortative, got $r")
    // constant in-degree: r mathematically undefined -> the documented 0.0
    val flat = Seq("h" -> "a", "h" -> "b", "h" -> "c", "h" -> "d", "a" -> "h")
    assert(run(flat) === ((5L, 0.0)))
    assert(reference(flat) === ((5L, 0.0)))
  }

  test("duplicate edges canonicalize away") {
    assert(run(mixed ++ mixed) === run(mixed))
  }

  test("result is identical across input partitioning") {
    assert(run(mixed, parts = 2) === run(mixed, parts = 11))
  }
}
