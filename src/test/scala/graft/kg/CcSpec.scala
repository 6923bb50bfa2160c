package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Connected components: label propagation (default) and the
  * large-star/small-star scale path must produce IDENTICAL labelings on
  * every graph shape — including the long chain that is label propagation's
  * worst case and the reason the O(log n) algorithm exists. */
class CcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def check(nodes: Seq[String], edges: Seq[(String, String)]): Unit = {
    val nodesDf = nodes.toDF("node")
    val edgesDf = edges.toDF("node_a", "node_b")
    val lp = labels(ConnectedComponents.run(nodesDf, edgesDf))
    val bs = labels(ConnectedComponents.runBigStar(nodesDf, edgesDf))
    assert(lp === bs)
  }

  test("chain graph (label-prop's worst case)") {
    val n = 40
    val nodes = (0 until n).map(i => f"n$i%03d")
    val edges = (0 until n - 1).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    check(nodes, edges)
    // chain collapses to ONE component rooted at the smallest node
    val bs = labels(ConnectedComponents.runBigStar(nodes.toDF("node"), edges.toDF("node_a", "node_b")))
    assert(bs.values.toSet === Set("C:n000"))
  }

  test("star, isolated nodes, multiple components, self-loops") {
    check(
      nodes = Seq("hub", "s1", "s2", "s3", "lonely", "p", "q"),
      edges = Seq(("hub", "s1"), ("hub", "s2"), ("s3", "hub"), ("p", "q"), ("p", "p")))
  }

  test("random graph parity") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 120).map(i => f"v$i%03d")
    val edges = Seq.fill(90)((nodes(rnd.nextInt(nodes.length)), nodes(rnd.nextInt(nodes.length))))
      .filter { case (a, b) => a != b }
    check(nodes, edges)
  }

  test("empty edge set: every node is its own component") {
    val bs = labels(ConnectedComponents.runBigStar(Seq("a", "b").toDF("node"),
      Seq.empty[(String, String)].toDF("node_a", "node_b")))
    assert(bs === Map("a" -> "C:a", "b" -> "C:b"))
  }
}
