package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for modularity: bit-exact agreement with an exact-rational
  * reference, the known two-clique topology (good partition scores high,
  * merged partition scores 0 for the whole-graph community), zero-intra
  * communities still reported, and partitioning independence. */
class ModularitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Exact-rational reference: BigInt numerators, one rounding at the end —
    * the same arithmetic contract the operator documents. */
  private def reference(edges: Seq[(String, String)], comm: String => String)
      : Map[String, (Long, Long, Double)] = {
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter(e => e._1 != e._2).distinct
    val m = BigInt(und.size)
    val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
    val dC = deg.groupBy { case (n, _) => comm(n) }.map { case (c, xs) => c -> xs.values.sum.toLong }
    val eC = und.filter(e => comm(e._1) == comm(e._2))
      .groupBy(e => comm(e._1)).map { case (c, xs) => c -> xs.size.toLong }
    dC.map { case (c, d) =>
      val e = eC.getOrElse(c, 0L)
      val num = m * 4 * e - BigInt(d) * BigInt(d)
      c -> (e, d, num.toDouble / (m * 4 * m).toDouble)
    }
  }

  // two triangles bridged by one edge — the canonical good partition
  private val twoCliques = Seq(
    "a" -> "b", "b" -> "c", "c" -> "a",
    "x" -> "y", "y" -> "z", "z" -> "x",
    "c" -> "x")
  private def firstHalf(n: String) = if (n < "m") "L" else "R"

  private def run(edges: Seq[(String, String)], comm: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Map[String, (Long, Long, Double)] =
    Modularity.run(edges.toDF("src", "dst"), comm)
      .as[(String, Long, Long, Double)].collect()
      .map { case (c, e, d, q) => c -> (e, d, q) }.toMap

  test("matches the exact-rational reference bit-for-bit") {
    val got = run(twoCliques, c => when(c < "m", "L").otherwise("R"))
    assert(got === reference(twoCliques, firstHalf))
  }

  test("good partition scores high; the all-in-one partition scores 0") {
    val good = run(twoCliques, c => when(c < "m", "L").otherwise("R"))
    assert(good.values.map(_._3).sum > 0.3)
    val one = run(twoCliques, _ => lit("all"))
    // Q of the whole graph as one community is exactly 1 - 1 = 0:
    // e_c = m and d_c = 2m, so 4m·m - (2m)² = 0
    assert(one("all")._3 === 0.0)
  }

  test("a community with zero intra edges still reports its degree penalty") {
    // star: center in community C, leaves in L — L has edges only ACROSS
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3")
    val got = run(star, c => when(c === "c", "C").otherwise("L"))
    assert(got === reference(star, n => if (n == "c") "C" else "L"))
    assert(got("L")._1 === 0L && got("L")._3 < 0.0)
  }

  test("self-loops and duplicate/reversed edges are canonicalized away") {
    val messy = twoCliques ++ Seq("b" -> "a", "a" -> "a", "x" -> "z")
    assert(run(messy, c => when(c < "m", "L").otherwise("R"))
      === reference(messy, firstHalf))
  }

  test("results are identical across input partitioning") {
    val a = run(twoCliques, c => when(c < "m", "L").otherwise("R"))
    val b = Modularity.run(twoCliques.toDF("src", "dst").repartition(7),
        c => when(c < "m", "L").otherwise("R"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (c, e, d, q) => c -> (e, d, q) }.toMap
    assert(a === b)
  }
}
