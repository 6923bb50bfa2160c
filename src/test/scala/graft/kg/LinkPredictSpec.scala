package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for neighborhood-overlap link prediction: agreement with a
  * driver-side set reference, adjacency exclusion, the mid-degree hub cap,
  * the minCommon floor, and partitioning independence. */
class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference over neighbor sets. */
  private def reference(edges: Seq[(String, String)], minCommon: Int,
                        maxMidDeg: Int): Map[(String, String), (Long, Double)] = {
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = nbrs.keys.toSeq.sorted
    (for {
      a <- nodes; b <- nodes; if a < b
      if !nbrs(a).contains(b)
      common = (nbrs(a) intersect nbrs(b)).count(m => nbrs(m).size <= maxMidDeg)
      if common >= minCommon
    } yield (a, b) -> (common.toLong,
      BigDecimal(common.toDouble / (nbrs(a).size + nbrs(b).size - common))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
  }

  private def run(edges: Seq[(String, String)], minCommon: Int = 2,
                  maxMidDeg: Int = 1 << 20, parts: Int = 3) =
    LinkPredict.run(edges.toDF("src", "dst").repartition(parts),
        minCommon = minCommon, maxMidDeg = maxMidDeg)
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, c, j) => (a, b) -> (c, j) }.toMap

  // square a-b-c-d-a plus a chord-free pentagon tail
  private val square = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")

  test("square: the two diagonals score jaccard 1.0 with 2 common neighbors") {
    val got = run(square)
    assert(got === Map(("a", "c") -> (2L, 1.0), ("b", "d") -> (2L, 1.0)))
    assert(got === reference(square, 2, 1 << 20))
  }

  test("adjacent pairs are never candidates, whatever their overlap") {
    // triangle + apex: every pair is adjacent except none — add a wedge
    val g = Seq("a" -> "b", "b" -> "c", "a" -> "c", "a" -> "d", "b" -> "d")
    val got = run(g, minCommon = 1)
    assert(!got.keySet.exists { case (x, y) => g.contains(x -> y) || g.contains(y -> x) })
    assert(got === reference(g, 1, 1 << 20))
  }

  test("minCommon floors the candidate set") {
    // e and f share exactly one neighbor (m)
    val g = Seq("e" -> "m", "f" -> "m")
    assert(run(g, minCommon = 2).isEmpty)
    assert(run(g, minCommon = 1) === Map(("e", "f") -> (1L, 1.0)))
  }

  test("the hub cap removes super-hub wedges deterministically") {
    // star: z links 5 leaves; all leaf pairs share only the hub z (deg 5)
    val star = (1 to 5).map(i => "z" -> s"l$i")
    assert(run(star, minCommon = 1, maxMidDeg = 4).isEmpty)
    val uncapped = run(star, minCommon = 1)
    assert(uncapped.size === 10 && uncapped.values.forall(_ == (1L, 1.0)))
    assert(uncapped === reference(star, 1, 1 << 20))
  }

  test("directed duplicates and self-loops canonicalize away") {
    val messy = square ++ square.map(_.swap) ++ Seq("a" -> "a")
    assert(run(messy) === run(square))
  }

  test("candidates are identical across input partitioning") {
    val g = square ++ Seq("c" -> "e", "d" -> "e", "a" -> "e")
    assert(run(g, parts = 2) === run(g, parts = 11))
    assert(run(g, parts = 2) === reference(g, 2, 1 << 20))
  }

  // ------------------------------------------------------------ Adamic-Adar

  /** Reference AA: per-mid fixed-point weight, exact Long pair sums. */
  private def referenceAa(edges: Seq[(String, String)], minCommon: Int)
      : Map[(String, String), (Long, Long)] = {
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    def w(m: String): Long = math.floor(1000000.0 / math.log(nbrs(m).size.toDouble)).toLong
    val nodes = nbrs.keys.toSeq.sorted
    (for {
      a <- nodes; b <- nodes; if a < b
      if !nbrs(a).contains(b)
      mids = (nbrs(a) intersect nbrs(b)).toSeq
      if mids.size >= minCommon
    } yield (a, b) -> (mids.size.toLong, mids.map(w).sum)).toMap
  }

  private def runAa(edges: Seq[(String, String)], minCommon: Int = 2, parts: Int = 3) =
    LinkPredict.runAdamicAdar(edges.toDF("src", "dst").repartition(parts),
        minCommon = minCommon)
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, c, s) => (a, b) -> (c, s) }.toMap

  test("adamic-adar matches the fixed-point reference bit-for-bit") {
    val g = square ++ Seq("c" -> "e", "d" -> "e", "a" -> "e", "b" -> "e")
    assert(runAa(g, minCommon = 1) === referenceAa(g, 1))
    assert(runAa(g) === referenceAa(g, 2))
  }

  test("a low-degree shared neighbor outweighs a high-degree one") {
    // p-q share mid m (deg 2); r-s share hub h (deg 6)
    val g = Seq("p" -> "m", "q" -> "m", "r" -> "h", "s" -> "h",
      "h" -> "x1", "h" -> "x2", "h" -> "x3", "h" -> "x4")
    val got = runAa(g, minCommon = 1)
    assert(got(("p", "q"))._2 > got(("r", "s"))._2)
    assert(got === referenceAa(g, 1))
  }

  test("adamic-adar scores are identical across input partitioning") {
    val g = square ++ Seq("c" -> "e", "d" -> "e", "a" -> "e")
    assert(runAa(g, parts = 2) === runAa(g, parts = 11))
  }
}
