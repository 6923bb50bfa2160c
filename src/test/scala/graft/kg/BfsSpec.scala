package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the depth-capped frontier BFS: agreement with a driver-side
  * queue-BFS reference on a synthetic directed graph (cycles, diamonds,
  * unreachable islands), depth-budget truncation, seed semantics, and
  * partitioning independence. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: textbook level-synchronous BFS, depth-capped. */
  private def reference(edges: Seq[(String, String)], seeds: Set[String],
                        maxDepth: Int): Map[String, Long] = {
    val adj = edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSeq
    var d = 0L
    while (frontier.nonEmpty && d < maxDepth) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains).distinct
      d += 1
      dist ++= next.map(_ -> d)
      frontier = next
    }
    dist
  }

  // diamond + cycle + an island unreachable from the seeds
  private val edges = Seq(
    "a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "d" -> "e",
    "e" -> "b", // cycle b→d→e→b
    "x" -> "y", "y" -> "x") // island
  private def run(seedSet: Set[String], maxDepth: Int = 12): Map[String, Long] =
    Bfs.run(edges.toDF("src", "dst"),
        seedPred = col("node").isin(seedSet.toSeq: _*), maxDepth = maxDepth)
      .as[(String, Long)].collect().toMap

  test("distances equal the queue-BFS reference (cycles and diamonds)") {
    assert(run(Set("a")) === reference(edges, Set("a"), 12))
    assert(run(Set("a")) === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 3L))
  }

  test("unreachable nodes are absent; islands reached only from island seeds") {
    val d = run(Set("a"))
    assert(!d.contains("x") && !d.contains("y"))
    assert(run(Set("x")) === Map("x" -> 0L, "y" -> 1L))
  }

  test("multi-source: every node takes the distance of its NEAREST seed") {
    assert(run(Set("a", "e")) === reference(edges, Set("a", "e"), 12))
    assert(run(Set("a", "e"))("b") === 1L) // via e→b, beating a→b's equal 1
  }

  test("the depth budget truncates WHICH nodes report, never a distance") {
    val chain = (0 until 10).map(i => s"n$i" -> s"n${i + 1}")
    val capped = Bfs.run(chain.toDF("src", "dst"), col("node") === "n0", maxDepth = 3)
      .as[(String, Long)].collect().toMap
    assert(capped === Map("n0" -> 0L, "n1" -> 1L, "n2" -> 2L, "n3" -> 3L))
    assert(capped === reference(chain, Set("n0"), 3))
  }

  test("maxDepth 0 returns exactly the seeds") {
    assert(run(Set("a"), maxDepth = 0) === Map("a" -> 0L))
  }

  test("seed predicate matching no node yields an empty result") {
    assert(run(Set("zzz")).isEmpty)
  }

  test("distances are identical across input partitioning") {
    val a = Bfs.run(edges.toDF("src", "dst").repartition(2), col("node") === "a")
      .as[(String, Long)].collect().toMap
    val b = Bfs.run(edges.toDF("src", "dst").repartition(7), col("node") === "a")
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }
}
