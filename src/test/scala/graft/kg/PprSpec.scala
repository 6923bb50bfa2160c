package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for personalized PageRank: bit-exact agreement with a driver-side
  * fixed-point reference, seed-locality of the rank mass, the zero-rank
  * contract for unreached nodes, and partitioning independence. */
class PprSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: the same Long fixed-point recurrence, naively. */
  private def reference(edges: Seq[(String, String)], seeds: Set[String],
                        iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outDeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = PageRank.Scale / seeds.size
    val base = init * 15L / 100L
    var rank = nodes.map(n => n -> (if (seeds(n)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, d) <- e; r = rank(s); if r > 0L)
        inflow(d) += r * 85L / (100L * outDeg(s))
      rank = nodes.map(n => n -> ((if (seeds(n)) base else 0L) + inflow(n))).toMap
    }
    rank
  }

  private val edges = Seq(
    "a" -> "b", "b" -> "c", "c" -> "a", // cycle holding the seed mass
    "c" -> "d", "d" -> "e",             // tail leaking away from the seeds
    "x" -> "y")                         // island unreachable from 'a'
  private def run(seeds: Set[String], iters: Int = 10): Map[String, Long] =
    Ppr.run(edges.toDF("src", "dst"),
        seedPred = col("node").isin(seeds.toSeq: _*), iterations = iters)
      .select("node", "rank_fp").as[(String, Long)].collect().toMap

  test("ranks are bit-identical to the fixed-point reference") {
    assert(run(Set("a")) === reference(edges, Set("a"), 10))
    assert(run(Set("a", "x"), iters = 6) === reference(edges, Set("a", "x"), 6))
  }

  test("rank decays with distance from the seed; unreachable nodes report 0") {
    val r = run(Set("a"))
    // seed-side cycle beats the leak-away tail (d and e trade mass between
    // rounds — d splits c's rank while e inherits d's whole rank — so only
    // the seed-vs-tail ordering is topology-stable)
    assert(r("a") > r("d") && r("a") > r("e"))
    assert(r("x") === 0L && r("y") === 0L)     // island never touched by mass
    assert(r.keySet === Set("a", "b", "c", "d", "e", "x", "y")) // all nodes report
  }

  test("personalization moves the mass: island seed ranks the island") {
    val r = run(Set("x"))
    assert(r("y") > 0L && r("a") === 0L)
  }

  test("a seed with no in-edges keeps exactly the restart term after round 1") {
    val r = Ppr.run(Seq("s" -> "t").toDF("src", "dst"),
        col("node") === "s", iterations = 3)
      .select("node", "rank_fp").as[(String, Long)].collect().toMap
    assert(r("s") === PageRank.Scale * 15L / 100L)
    assert(r === reference(Seq("s" -> "t"), Set("s"), 3))
  }

  test("no seed matches is rejected") {
    intercept[IllegalArgumentException] {
      Ppr.run(edges.toDF("src", "dst"), col("node") === "zzz")
    }
  }

  test("ranks are identical across input partitioning") {
    val a = Ppr.run(edges.toDF("src", "dst").repartition(2), col("node") === "a")
      .select("node", "rank_fp").as[(String, Long)].collect().toMap
    val b = Ppr.run(edges.toDF("src", "dst").repartition(7), col("node") === "a")
      .select("node", "rank_fp").as[(String, Long)].collect().toMap
    assert(a === b)
  }
}
