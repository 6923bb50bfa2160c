package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the fixed-point PageRank: agreement with a driver-side
  * reference implementation of the SAME integer arithmetic, hand-checkable
  * structure on a star graph, partitioning independence (the invariant the
  * fixed-point design exists to guarantee), and mass accounting. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: identical fixed-point update rule. */
  private def reference(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.length
    val outDeg = e.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val init = PageRank.Scale / n
    val base = init * 15L / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) * 85L / (100L * outDeg(src)) }.sum
      }
      r = nodes.map(v => v -> (base + inflow.getOrElse(v, 0L))).toMap
    }
    r
  }

  private val webEdges: Seq[(String, String)] = {
    // deterministic scale-free-ish digraph: 60 nodes, preferential targets
    (0 until 200).map { i =>
      val s = Synth.splitmix64(i * 7 + 1) % 60
      val d = Synth.splitmix64(i * 13 + 5) % (1 + (i % 12).toLong) // skewed: low ids are hot
      (s"n$s", s"n$d")
    }.filter(p => p._1 != p._2)
  }

  // one 10-iteration distributed run shared by the reference-equality and
  // mass-accounting tests (each PageRank iteration is a join+agg+count job —
  // don't pay it twice)
  private lazy val webRun = PageRank.run(webEdges.toDF("src", "dst"), iterations = 10)
    .select($"node", $"rank_fp").as[(String, Long)].collect().toMap

  test("distributed ranks equal the driver-side fixed-point reference exactly") {
    assert(webRun === reference(webEdges, 10))
  }

  test("star graph: hub absorbs the spokes' mass, exact hand computation at 1 iter") {
    // 4 spokes each point at the hub; hub points at spoke a
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"), ("hub", "a"))
    val got = PageRank.run(edges.toDF("src", "dst"), iterations = 1)
      .select($"node", $"rank_fp").as[(String, Long)].collect().toMap
    val init = PageRank.Scale / 5
    val base = init * 15L / 100L
    assert(got("hub") === base + 4L * (init * 85L / 100L))
    assert(got("a") === base + init * 85L / 100L)
    assert(got("b") === base)
  }

  test("ranks are partitioning-independent (the fixed-point guarantee)") {
    val df1 = webEdges.toDF("src", "dst").repartition(1)
    val df7 = webEdges.toDF("src", "dst").repartition(7, $"dst")
    val r1 = PageRank.run(df1, iterations = 3).select($"node", $"rank_fp")
      .as[(String, Long)].collect().toMap
    val r7 = PageRank.run(df7, iterations = 3).select($"node", $"rank_fp")
      .as[(String, Long)].collect().toMap
    assert(r1 === r7)
    assert(r1 === reference(webEdges, 3))
  }

  test("mass accounting: total never exceeds Scale and stays within damping loss") {
    val total = webRun.values.sum
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale / 10) // base mass alone is 15%; inflow keeps more
    // rank column is the exact fp/Scale quotient
    val out = PageRank.run(Seq(("a", "b"), ("b", "a")).toDF("src", "dst"), iterations = 2)
    val bad = out.filter($"rank" =!= $"rank_fp".cast("double") / lit(PageRank.Scale.toDouble)).count()
    assert(bad === 0L)
  }
}
