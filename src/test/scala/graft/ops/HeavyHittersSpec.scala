package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the two-pass CMS heavy hitters: exact agreement with a
  * driver-side brute-force count at comfortable sketch sizes AND at an
  * adversarially tiny sketch (heavy collisions — the no-false-negative CMS
  * property is what keeps the answer exact), n-gram windowing edges, and
  * partitioning independence. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def brute(docs: Seq[String], n: Int, minCount: Long): Map[String, Long] =
    docs.flatMap { text =>
      val t = text.trim.toLowerCase.split("\\s+").toSeq.filter(_ => text.trim.nonEmpty)
      if (t.length < n) Nil else t.sliding(n).map(_.mkString(" ")).toSeq
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= minCount).toMap

  private def run(docs: Seq[String], n: Int, minCount: Long,
                  d: Int = 4, w: Int = 1024): Map[String, Long] =
    HeavyHitters.heavyGrams(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      n, minCount, d, w)
      .as[(String, Long)].collect().toMap

  // Zipf-ish corpus: "the end" planted hot, mid-frequency pairs, unique tail
  private val corpus: Seq[String] =
    (0 until 60).map(i => s"the end of part $i brings the end") ++
      (0 until 9).map(i => s"spark shuffle stage $i") ++
      Seq("", "   ", "one")

  test("exact agreement with brute force") {
    val expected = brute(corpus, 2, 5L)
    assert(expected.nonEmpty && expected.contains("the end"))
    assert(run(corpus, 2, 5L) === expected)
  }

  test("exact even when the sketch is absurdly small (every bucket collides)") {
    assert(run(corpus, 2, 5L, d = 2, w = 2) === brute(corpus, 2, 5L))
    assert(run(corpus, 2, 5L, d = 1, w = 2) === brute(corpus, 2, 5L))
  }

  test("trigrams and a threshold that empties the answer") {
    assert(run(corpus, 3, 10L) === brute(corpus, 3, 10L))
    assert(run(corpus, 2, 1000L) === Map.empty)
  }

  test("docs shorter than n contribute nothing") {
    assert(run(Seq("one", "a b", ""), 3, 1L) === Map.empty)
    assert(run(Seq("a b", "a b"), 2, 2L) === Map("a b" -> 2L))
  }

  test("native word_grams kernel is bit-identical to the HOF formulation") {
    val edgy = corpus ++ Seq("a", "a b", "a b c", "  padded   tokens\there ",
      "UPPER Case MiXeD", "x\ny\fz\rq")
    val df = edgy.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val kernel = df.select(col("doc_id"),
        HeavyHitters.gramStrings(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val hof = df.select(col("doc_id"),
        HeavyHitters.gramStringsHof(col("text"), n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      assert(kernel === hof, s"kernel/HOF divergence at n=$n")
    }
  }

  test("partitioning independence") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def at(parts: Int) = HeavyHitters.heavyGrams(df.repartition(parts), 2, 5L)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(at(1) === at(7))
  }
}
