package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for containment near-dup mining: brute-force agreement, the
  * excerpt case Jaccard structurally misses, the stop-shingle cap, and
  * partitioning independence. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def shingleSet(text: String, n: Int): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.length < n) Set(t.mkString(" ")) else t.sliding(n).map(_.mkString(" ")).toSet
  }

  private def reference(docs: Seq[(Long, String)], thr: Double, n: Int)
      : Map[(Long, Long), (Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t, n) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh; if a < b
      inter = (sa intersect sb).size
      if inter > 0
      c = inter.toDouble / math.min(sa.size, sb.size)
      if c >= thr
    } yield (a, b) -> (inter.toLong,
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
  }

  private def run(docs: Seq[(Long, String)], thr: Double = 0.9, n: Int = 3,
                  maxDf: Int = 2000, parts: Int = 3) =
    Dedup.containmentPairs(docs.toDF("doc_id", "text").repartition(parts),
        threshold = thr, n = n, maxDf = maxDf)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, i, c) => (a, b) -> (i, c) }.toMap

  private val long1 = (1 to 40).map(i => s"w$i").mkString(" ")
  private val docs = Seq(
    1L -> long1,
    2L -> (11 to 20).map(i => s"w$i").mkString(" "),  // verbatim excerpt of 1
    3L -> (1 to 40).map(i => s"x$i").mkString(" "),   // unrelated long doc
    4L -> "a b c d e f")

  test("finds the excerpt that jaccard misses") {
    val got = run(docs)
    assert(got === reference(docs, 0.9, 3))
    assert(got(((1L, 2L)))._2 === 1.0, "excerpt fully contained")
    // the same pair is invisible to jaccard at any useful threshold
    val jac = Dedup.jaccardPairs(docs.toDF("doc_id", "text"),
        threshold = 0.5, n = 3, maxDf = 2000)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => p._1 == 1L && p._2 == 2L),
      "if jaccard caught it the operator would be redundant")
  }

  test("threshold filters; partial overlap scores the exact ratio") {
    // doc 5 shares half its shingles with doc 1
    val d5 = ((11 to 15).map(i => s"w$i") ++ (1 to 5).map(i => s"z$i")).mkString(" ")
    val got = run(docs :+ (5L -> d5), thr = 0.1)
    assert(got === reference(docs :+ (5L -> d5), 0.1, 3))
    val (_, c) = got((1L, 5L))
    assert(c > 0.3 && c < 0.7)
  }

  test("the stop-shingle cap bounds pair fan-out deterministically") {
    // one shingle shared by many docs dies at maxDf; pairs via it vanish
    val boiler = (1 to 12).map(i => (100L + i) -> s"the same footer line ${"pad " * 3}")
    assert(run(boiler, thr = 0.1, maxDf = 5).isEmpty)
    assert(run(boiler, thr = 0.1, maxDf = 2000).nonEmpty)
  }

  test("pairs are identical across input partitioning") {
    assert(run(docs, parts = 2) === run(docs, parts = 11))
  }
}
