package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for duplicated-n-gram coverage: hand-computed interval unions
  * (overlapping, touching, disjoint windows), exact-copy full coverage,
  * within-doc repeats, short-doc edges, and partitioning independence. */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Long, Long, Double)] =
    SubstrDedup.dupNgramCoverage(docs.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("an exact copy lights up BOTH docs with full coverage") {
    val t = "a b c d e f g h i j" // 10 tokens, 3 grams at n=8
    val r = run(Seq(1L -> t, 2L -> t), n = 8)
    assert(r(1L) === ((10L, 3L, 3L, 10L, 1.0)))
    assert(r(2L) === ((10L, 3L, 3L, 10L, 1.0)))
  }

  test("a unique doc has zero duplicated coverage") {
    val r = run(Seq(1L -> "a b c d e f g h i j", 2L -> "k l m n o p q r s t"), 8)
    assert(r(1L) === ((10L, 3L, 0L, 0L, 0.0)))
  }

  test("interval union: overlapping windows merge, disjoint windows add") {
    // shared n=3 windows inside a longer unique doc:
    //   'x1 x2 x3 x4' plants grams at pos 2,3 (overlap → union 4 tokens)
    //   'y1 y2 y3' plants one gram later, disjoint → +3 tokens
    val shared = "x1 x2 x3 x4 u1 u2 y1 y2 y3"
    val doc1 = s"a1 a2 $shared a3" // 12 tokens
    val doc2 = s"b1 $shared b2 b3"
    val r = run(Seq(1L -> doc1, 2L -> doc2), n = 3)
    // doc1 dup grams: (x1 x2 x3)@2 (x2 x3 x4)@3 … wait — every 3-gram inside
    // `shared` is shared between the docs: positions 2..8 in doc1 (7 grams),
    // a contiguous run → union covers tokens 2..10 = 9 tokens
    assert(r(1L)._3 === 7L)
    assert(r(1L)._4 === 9L)
    assert(r(1L)._1 === 12L && r(1L)._2 === 10L)
    assert(r(1L)._5 === (9.0 / 12.0 * 10000).round / 10000.0)
  }

  test("within-doc repetition alone counts as duplication") {
    // the same 3-gram twice in ONE doc: 'p q r s p q r' has (p q r)@0 and @4
    val r = run(Seq(1L -> "p q r s p q r"), n = 3)
    assert(r(1L)._3 === 2L) // two occurrences of the duplicated gram
    assert(r(1L)._4 === 6L) // [0,3) ∪ [4,7) — disjoint, 6 tokens
  }

  test("docs shorter than n yield zero grams; empty text yields ratio 0") {
    val r = run(Seq(1L -> "a b", 2L -> "a b", 3L -> "   "), n = 8)
    assert(r(1L) === ((2L, 0L, 0L, 0L, 0.0)))
    assert(r(3L) === ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("touching windows (gap exactly n) add without double-count") {
    // gram@0 and gram@3 with n=3: [0,3) ∪ [3,6) = 6 tokens exactly
    val t = "m m m m m m z1 z2" // every 3-gram of m-run is 'm m m' (dup within doc)
    val r = run(Seq(1L -> t), n = 3)
    // m-run: grams at 0..3 all 'm m m' (4 occurrences) → union [0,6) = 6
    assert(r(1L)._3 === 4L && r(1L)._4 === 6L)
  }

  test("results are identical across input partitioning") {
    val docs = (0 until 40).map(i => i.toLong -> s"w${i % 7} a b c d e f g h w${i % 5}")
    val a = SubstrDedup.dupNgramCoverage(docs.toDF("doc_id", "text").repartition(2), 8)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val b = SubstrDedup.dupNgramCoverage(docs.toDF("doc_id", "text").repartition(17), 8)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(a === b)
  }
}
