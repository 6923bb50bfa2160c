package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gates for TF-IDF keyword extraction: agreement with a driver-side
  * reference of the SAME fixed-point arithmetic, salience semantics (a
  * ubiquitous word never outranks a distinctive one), deterministic ties,
  * and partitioning independence. */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: identical tf/df/idf_fp/score_fp/top-k. */
  private def reference(docs: Seq[(Long, String)], k: Int)
      : Map[(Long, Long), (String, Long, Long)] = {
    def words(t: String): Seq[String] =
      if (t.trim.isEmpty) Nil else t.trim.toLowerCase.split("[ \\t\\n\\f\\r]+").toSeq
    val tf = docs.flatMap { case (id, t) => words(t).map(w => (id, w)) }
      .groupBy(identity).map { case ((id, w), xs) => (id, w) -> xs.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val n = docs.size.toLong
    val idf = df.map { case (w, d) =>
      w -> math.floor(1000000.0 * math.log((n + 1).toDouble / (d + 1).toDouble)).toLong
    }
    tf.toSeq.map { case ((id, w), f) => (id, w, f, f * idf(w)) }
      .groupBy(_._1).flatMap { case (id, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(k).zipWithIndex.map { case (r, i) =>
          (id, i + 1L) -> ((r._2, r._3, r._4))
        }
      }
  }

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox the the",
    2L -> "the lazy dog sleeps the",
    3L -> "the quick dog barks loudly",
    4L -> "alpha beta alpha GAMMA gamma",
    5L -> "  ", // whitespace-only: contributes to N, yields no keywords
    6L -> "the the the the") // only the ubiquitous word

  private def run(k: Int): Map[(Long, Long), (String, Long, Long)] =
    Tfidf.keywords(docs.toDF("doc_id", "text"), k = k)
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("top-k equals the driver-side fixed-point reference exactly") {
    assert(run(3) === reference(docs, 3))
  }

  test("a corpus-ubiquitous word never outranks a distinctive one") {
    val r = run(3)
    // doc 3 (all tf 1): rare words rank 1-2, then the dog/quick tie breaks
    // alphabetically — ubiquitous 'the' (df 4) never makes the top 3
    val doc3 = (1 to 3).map(rk => r((3L, rk.toLong))._1)
    assert(doc3 === Seq("barks", "loudly", "dog"))
    // doc 6 has ONLY 'the': it must still surface (score may be small)
    assert(r((6L, 1L))._1 === "the")
  }

  test("case folding merges tokens and ties break by ascending word") {
    val r = run(4)
    // doc 4: alpha tf 2, gamma tf 2 (GAMMA folds), beta tf 1 — alpha ≺ gamma
    assert(r((4L, 1L))._1 === "alpha" && r((4L, 2L))._1 === "gamma")
    assert(r((4L, 1L))._2 === 2L && r((4L, 2L))._2 === 2L)
    assert(r((4L, 3L))._1 === "beta")
  }

  test("whitespace-only docs yield no rows but still raise N") {
    val r = run(3)
    assert(!r.keys.exists(_._1 == 5L))
    // idf uses N = 6 (incl. the empty doc): floor(1e6·ln(7/(df+1)))
    val fox = r((1L, 2L)) // doc 1 ranks: brown, fox (tie, word asc), the
    assert(fox._1 === "fox")
    assert(fox._3 === math.floor(1000000.0 * math.log(7.0 / 2.0)).toLong)
  }

  test("results are identical across input partitioning") {
    val a = Tfidf.keywords(docs.toDF("doc_id", "text").repartition(2), k = 3)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val b = Tfidf.keywords(docs.toDF("doc_id", "text").repartition(11), k = 3)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(a === b)
  }
}
