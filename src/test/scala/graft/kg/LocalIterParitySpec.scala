package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The driver-local small-graph fixpoints must be BIT-IDENTICAL to the
  * distributed paths — same Long arithmetic, same orderings. Each test runs
  * the operator twice: once under the default bound (local path taken) and
  * once with `spark.graft.localIterMaxEdges = 0` (distributed path forced),
  * and compares full result maps. */
class LocalIterParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Key = "spark.graft.localIterMaxEdges"

  /** Evaluate `f` with the distributed path forced. */
  private def distributed[A](f: => A): A = {
    spark.conf.set(Key, "0")
    try f finally spark.conf.set(Key, "200000")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // a directed multi-component graph with hubs, chains and a cycle
  private lazy val edges: Seq[(String, String)] = {
    val rnd = new scala.util.Random(11)
    val nodes = (0 until 80).map(i => f"n$i%03d")
    val random = Seq.fill(150)((nodes(rnd.nextInt(nodes.length)), nodes(rnd.nextInt(nodes.length))))
      .filter { case (a, b) => a != b }
    val chain = (0 until 20).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
    val hub = (1 until 12).map(i => (s"hub", f"leaf$i%02d"))
    (random ++ chain ++ hub).distinct
  }
  private lazy val edgesDf = edges.toDF("src", "dst")

  test("PageRank local ≡ distributed (bit-exact)") {
    val local = rows(PageRank.run(edgesDf, iterations = 6))
    val dist = distributed(rows(PageRank.run(edgesDf, iterations = 6)))
    assert(local === dist)
  }

  test("weighted PageRank local ≡ distributed (bit-exact)") {
    val w = edges.zipWithIndex.map { case ((a, b), i) => (a, b, 1L + (i % 7) * 1000L) }
      .toDF("src", "dst", "w")
    val local = rows(WeightedPageRank.run(w, iterations = 6))
    val dist = distributed(rows(WeightedPageRank.run(w, iterations = 6)))
    assert(local === dist)
  }

  test("HITS local ≡ distributed (bit-exact)") {
    val local = rows(Hits.run(edgesDf, iterations = 5))
    val dist = distributed(rows(Hits.run(edgesDf, iterations = 5)))
    assert(local === dist)
  }

  test("PPR local ≡ distributed (bit-exact), incl. Catalyst seed predicate") {
    val pred = substring(md5(col("node")), 1, 1).isin("0", "1", "2")
    val local = rows(Ppr.run(edgesDf, pred, iterations = 6))
    val dist = distributed(rows(Ppr.run(edgesDf, pred, iterations = 6)))
    assert(local === dist)
  }

  test("BFS local ≡ distributed, shallow and deep caps") {
    val pred = substring(md5(col("node")), 1, 1).isin("0", "1")
    for (depth <- Seq(2, 12, 30)) {
      val local = rows(Bfs.run(edgesDf, pred, maxDepth = depth))
      val dist = distributed(rows(Bfs.run(edgesDf, pred, maxDepth = depth)))
      assert(local === dist, s"depth $depth")
    }
  }

  test("k-core local ≡ distributed") {
    for (k <- Seq(2, 3)) {
      val local = rows(KCore.run(edgesDf, k = k))
      val dist = distributed(rows(KCore.run(edgesDf, k = k)))
      assert(local === dist, s"k=$k")
    }
  }

  test("connected components local ≡ distributed (isolated nodes label themselves)") {
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++ Seq("iso1", "iso2")).distinct.toDF("node")
    val e = edges.toDF("node_a", "node_b")
    val local = rows(ConnectedComponents.run(nodes, e))
    val dist = distributed(rows(ConnectedComponents.run(nodes, e)))
    assert(local === dist)
    assert(local.exists(_ == Seq("iso1", "C:iso1")))
  }

  test("CC component minimum uses UTF-8 byte order, not UTF-16") {
    // U+1F600 (😀) encodes F0 9F 98 80 in UTF-8 (above U+FFFD's EF BF BD)
    // but its UTF-16 surrogates D83D DE00 sort BELOW U+FFFD — a Java
    // compareTo minimum would pick the wrong label here
    val a = "😀"
    val b = "�"
    val nodes = Seq(a, b).toDF("node")
    val e = Seq((a, b)).toDF("node_a", "node_b")
    val local = rows(ConnectedComponents.run(nodes, e))
    val dist = distributed(rows(ConnectedComponents.run(nodes, e)))
    assert(local === dist)
    assert(local.forall(_(1) == s"C:$b")) // U+FFFD is the UTF-8 minimum
  }
}
