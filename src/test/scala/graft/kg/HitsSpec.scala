package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for the fixed-point L1 HITS: agreement with a driver-side
  * reference of the SAME integer arithmetic, hand-checkable structure on a
  * bipartite hub/authority graph, partitioning independence, and L1 mass
  * accounting. */
class HitsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: identical fixed-point half-steps. */
  private def reference(edges: Seq[(String, String)], iters: Int)
      : Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val init = Hits.Scale / nodes.length
    def half(scores: Map[String, Long], by: ((String, String)) => String,
             of: ((String, String)) => String): Map[String, Long] = {
      val raw = e.groupBy(by).map { case (k, es) => k -> es.map(p => scores(of(p))).sum }
      val tot = raw.values.sum
      nodes.map(v => v -> raw.getOrElse(v, 0L) * Hits.Scale / tot).toMap
    }
    var hubs = nodes.map(_ -> init).toMap
    var auth = hubs
    for (_ <- 0 until iters) {
      auth = half(hubs, _._2, _._1) // auth(dst) ← hub(src)
      hubs = half(auth, _._1, _._2) // hub(src) ← auth(dst)
    }
    nodes.map(v => v -> ((auth(v), hubs(v)))).toMap
  }

  private val webEdges: Seq[(String, String)] = (0 until 200).map { i =>
    val s = Synth.splitmix64(i * 7 + 1) % 60
    val d = Synth.splitmix64(i * 13 + 5) % (1 + (i % 12).toLong)
    (s"n$s", s"n$d")
  }.filter(p => p._1 != p._2)

  private lazy val webRun = Hits.run(webEdges.toDF("src", "dst"), iterations = 4)
    .select($"node", $"auth_fp", $"hub_fp").as[(String, Long, Long)]
    .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("distributed scores equal the driver-side fixed-point reference exactly") {
    assert(webRun === reference(webEdges, 4))
  }

  test("bipartite graph: pure hubs get zero authority, pure authorities zero hub") {
    // h1,h2 each link a1,a2,a3; a-side has no out-links
    val edges = for (h <- Seq("h1", "h2"); a <- Seq("a1", "a2", "a3")) yield (h, a)
    val got = Hits.run(edges.toDF("src", "dst"), iterations = 2)
      .select($"node", $"auth_fp", $"hub_fp").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (h <- Seq("h1", "h2")) assert(got(h)._1 === 0L) // hubs: no in-links
    for (a <- Seq("a1", "a2", "a3")) assert(got(a)._2 === 0L) // authorities: no out-links
    // symmetric roles split the mass evenly (exact: 3 and 2 divide 1e9's factors)
    assert(got("h1")._2 === got("h2")._2)
    assert(got("a1")._1 === got("a2")._1)
    assert(got("a1")._1 === got("a3")._1)
  }

  test("scores are partitioning-independent (the fixed-point guarantee)") {
    val df1 = webEdges.toDF("src", "dst").repartition(1)
    val df7 = webEdges.toDF("src", "dst").repartition(7, $"dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Hits.run(df, iterations = 2).select($"node", $"auth_fp", $"hub_fp")
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val r1 = run(df1)
    assert(r1 === run(df7))
    assert(r1 === reference(webEdges, 2))
  }

  test("L1 mass accounting: each vector sums to at most Scale, above floor loss") {
    val auths = webRun.values.map(_._1).sum
    val hubs = webRun.values.map(_._2).sum
    for (tot <- Seq(auths, hubs)) {
      assert(tot <= Hits.Scale)
      assert(tot > Hits.Scale - 60) // ≤ 1 unit of floor loss per node
    }
  }
}
