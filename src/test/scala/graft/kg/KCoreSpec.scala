package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for the k-core peel: agreement with a driver-side reference peel,
  * textbook structures (cliques, trees, a clique with pendant paths), and
  * partitioning independence. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: literal iterative peel on an adjacency map. */
  private def reference(edges: Seq[(String, String)], k: Int): Map[String, Long] = {
    var und = edges.map(e => if (e._1 < e._2) e else e.swap).distinct
      .filter(e => e._1 != e._2)
    var changed = true
    while (changed) {
      val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      und = und.filterNot(e => bad(e._1) || bad(e._2))
    }
    und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  private def run(edges: Seq[(String, String)], k: Int): Map[String, Long] =
    KCore.run(edges.toDF("src", "dst"), k)
      .as[(String, Long)].collect().toMap

  // K5 clique with a pendant path hanging off one vertex
  private val cliquePlusTail = (for {
    i <- 0 until 5; j <- (i + 1) until 5
  } yield s"c$i" -> s"c$j") ++ Seq("c0" -> "t1", "t1" -> "t2", "t2" -> "t3")

  test("K5 + pendant path: the 3-core is exactly the clique at degree 4") {
    val core = run(cliquePlusTail, 3)
    assert(core === (0 until 5).map(i => s"c$i" -> 4L).toMap)
    assert(core === reference(cliquePlusTail, 3))
  }

  test("a tree has an empty 2-core") {
    val tree = Seq("r" -> "a", "r" -> "b", "a" -> "c", "a" -> "d", "b" -> "e")
    assert(run(tree, 2).isEmpty)
    assert(reference(tree, 2).isEmpty)
  }

  test("a cycle IS its own 2-core; direction and duplicate edges are ignored") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "b" -> "a" /* reverse dup */, "a" -> "a" /* self-loop */)
    assert(run(cycle, 2) === Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L))
  }

  test("cascading peel: removing a leaf layer exposes the next (multi-round)") {
    // path of hubs, each with one extra leaf: peeling leaves shaves the path
    // ends round after round — a 2-core must come out empty via >1 round
    val comb = (0 until 6).flatMap(i =>
      Seq(s"p$i" -> s"leaf$i") ++ (if (i > 0) Seq(s"p${i - 1}" -> s"p$i") else Nil))
    assert(run(comb, 2).isEmpty)
    assert(reference(comb, 2).isEmpty)
  }

  test("results are identical across input partitioning") {
    val a = KCore.run(cliquePlusTail.toDF("src", "dst").repartition(2), 3)
      .as[(String, Long)].collect().toMap
    val b = KCore.run(cliquePlusTail.toDF("src", "dst").repartition(13), 3)
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("maxRounds smaller than the peel depth fails loudly") {
    // a long pendant path needs one round per vertex shaved off its end
    val path = (0 until 12).map(i => s"n$i" -> s"n${i + 1}")
    intercept[IllegalArgumentException] {
      KCore.run(path.toDF("src", "dst"), k = 2, maxRounds = 2).count()
    }
  }
}
