package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for FastSS fuzzy linking: exact agreement with a brute-force
  * all-pairs levenshtein reference (recall AND precision of the deletion-
  * neighborhood blocking), exactly-once pairs, each edit class covered,
  * and partitioning independence. */
class FuzzyLinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def reference(qs: Seq[String], ws: Seq[String]): Set[(String, String, Long)] =
    (for (q <- qs.distinct; w <- ws.distinct; d = lev(q, w); if d <= 1)
      yield (q, w, d.toLong)).toSet

  private def run(qs: Seq[String], ws: Seq[String]): Seq[(String, String, Long)] =
    FuzzyLink.matchEd1(qs.toDF("query"), ws.toDF("word"))
      .as[(String, String, Long)].collect().toSeq

  private val dict = Seq("hash", "join", "scan", "filter", "row", "batch", "a")
  private val queries = Seq(
    "hash",   // exact
    "hsh",    // deletion
    "hashx",  // insertion at end
    "xhash",  // insertion at front
    "hosh",   // substitution
    "jon",    // deletion from join
    "roe",    // substitution from row
    "b",      // substitution from a (1-char strings)
    "zzz")    // no match

  test("matches brute-force all-pairs levenshtein exactly (recall + precision)") {
    val got = run(queries, dict)
    assert(got.size === got.toSet.size, "a pair was produced more than once")
    assert(got.toSet === reference(queries, dict))
    assert(got.toSet.contains(("hosh", "hash", 1L)))   // substitution class
    assert(got.toSet.contains(("hsh", "hash", 1L)))    // deletion class
    assert(got.toSet.contains(("xhash", "hash", 1L)))  // insertion class
    assert(got.toSet.contains(("hash", "hash", 0L)))   // identity
    assert(!got.exists(_._1 == "zzz"))
  }

  test("randomized corpus: blocking never misses a true ED<=1 pair") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    val words = Seq.fill(120)((1 to (1 + rnd.nextInt(5))).map(_ => alpha(rnd.nextInt(4))).mkString).distinct
    assert(run(words, words).toSet === reference(words, words))
  }

  test("duplicate inputs collapse; results identical across partitioning") {
    val a = run(queries ++ queries, dict ++ dict).toSet
    val b = FuzzyLink.matchEd1(
        queries.toDF("query").repartition(7), dict.toDF("word").repartition(3))
      .as[(String, String, Long)].collect().toSet
    assert(a === b && a === reference(queries, dict))
  }
}
