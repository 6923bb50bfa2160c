package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for weighted PageRank: bit-exact agreement with a driver-side
  * fixed-point reference, weight sensitivity (heavier edge passes more
  * mass), duplicate-edge collapse, positive-weight contract, and
  * partitioning independence. */
class WeightedPageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val F = WeightedPageRank.FracScale

  private def reference(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, Long] = {
    val e0 = edges.groupBy(e => (e._1, e._2))
      .map { case ((s, d), xs) => (s, d, xs.map(_._3).sum) }.toSeq
    val wOut = e0.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val eFrac = e0.map { case (s, d, w) => (s, d, w * F / wOut(s)) }
    val nodes = (e0.map(_._1) ++ e0.map(_._2)).distinct
    val init = PageRank.Scale / nodes.size
    val base = init * 15L / 100L
    var rank = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, d, frac) <- eFrac)
        inflow(d) += (rank(s) * 85L / 100L) * frac / F
      rank = nodes.map(n => n -> (base + inflow(n))).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int = 10)
      : Map[String, Long] =
    WeightedPageRank.run(edges.toDF("src", "dst", "w"), iterations = iters)
      .select("node", "rank_fp").as[(String, Long)].collect().toMap

  private val edges = Seq(
    ("a", "b", 9L), ("a", "c", 1L),   // a sends 90% of its mass to b
    ("b", "a", 1L), ("c", "a", 1L),
    ("b", "d", 3L), ("d", "b", 2L))

  test("ranks are bit-identical to the fixed-point reference") {
    assert(run(edges) === reference(edges, 10))
    assert(run(edges, iters = 3) === reference(edges, 3))
  }

  test("the heavier edge's target outranks the lighter edge's target") {
    val r = run(edges)
    assert(r("b") > r("c"))
  }

  test("duplicate edges collapse by summing weights") {
    val dup = Seq(("a", "b", 4L), ("a", "b", 5L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L), ("b", "d", 3L), ("d", "b", 2L))
    assert(run(dup) === run(edges))
  }

  test("non-positive weights are rejected") {
    intercept[IllegalArgumentException] {
      run(Seq(("a", "b", 0L), ("b", "a", 1L)))
    }
  }

  test("ranks are identical across input partitioning") {
    val a = run(edges)
    val b = WeightedPageRank.run(edges.toDF("src", "dst", "w").repartition(7))
      .select("node", "rank_fp").as[(String, Long)].collect().toMap
    assert(a === b)
  }
}
