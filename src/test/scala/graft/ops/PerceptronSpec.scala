package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the fixed-point batch perceptron: bit-identical agreement with
  * a driver-side reference of the SAME integer arithmetic, partitioning
  * independence of the gradient sums (the determinism invariant), that it
  * genuinely learns the stopword-density target, and the feature/label
  * integer definitions. */
class PerceptronSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side reference: identical features, batch update, unit lr. */
  private def reference(rows: Seq[(Long, Long, Long, Long)], epochs: Int): Array[Long] = {
    var w = Array(0L, 0L, 0L, 0L)
    (1 to epochs).foreach { _ =>
      var g = Array(0L, 0L, 0L, 0L)
      rows.foreach { case (y, x1, x2, x3) =>
        val dot = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        if ((y == 1L) != (dot > 0L)) {
          g(0) += y; g(1) += y * x1; g(2) += y * x2; g(3) += y * x3
        }
      }
      w = Array(w(0) + g(0), w(1) + g(1), w(2) + g(2), w(3) + g(3))
    }
    w
  }

  // stopword-rich (label +1) and stopword-free (label -1) docs, with noise
  private val docs: Seq[(Long, String)] =
    (0 until 40).map(i => i.toLong -> s"the cat is on the mat and it was fine $i") ++
      (40 until 80).map(i => i.toLong -> s"quantum lattice boson gauge field $i theory") ++
      Seq(80L -> "", 81L -> "the", 82L -> "punctuation: heavy!! (very, heavy)...")

  private lazy val df = docs.toDF("doc_id", "text")

  test("feature and label definitions (integer-exact)") {
    val f = Perceptron.features(df).filter(col("doc_id").isin(0L, 40L, 80L, 81L))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 0: 11 tokens, stopwords {the,is,on,the,and,it,was} = 7 → 140 ≥ 11 → +1
    assert(f(0) === ((0L, 1L, 11L, 7L, 0L)))
    // doc 40: 7 tokens, 0 stopwords → -1
    assert(f(1) === ((40L, -1L, 7L, 0L, 0L)))
    // empty doc: all zero, label -1 (nt > 0 fails)
    assert(f(2) === ((80L, -1L, 0L, 0L, 0L)))
    // "the": 1 token, 1 stopword → 20 ≥ 1 → +1
    assert(f(3) === ((81L, 1L, 1L, 1L, 0L)))
  }

  test("trained weights bit-identical to the driver-side reference") {
    val rows = Perceptron.features(df)
      .select("y", "x1", "x2", "x3").as[(Long, Long, Long, Long)]
      .collect().toSeq
    (1 to 6).foreach { e =>
      assert(Perceptron.train(Perceptron.features(df), e).toSeq
        === reference(rows, e).toSeq, s"epochs=$e")
    }
  }

  test("partitioning independence of training") {
    def at(parts: Int) =
      Perceptron.train(Perceptron.features(df.repartition(parts)), 5).toSeq
    assert(at(1) === at(11))
  }

  test("classify learns the separable stopword target") {
    val out = Perceptron.classify(df, epochs = 5)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === docs.length)
    // margin is the exact integer dot product; prediction is its sign
    assert(out.forall { case (_, _, s, p) => p === (s > 0L) })
    val acc = out.count { case (_, y, _, p) => (y == 1L) == p }.toDouble / out.length
    assert(acc >= 0.9, s"accuracy $acc — the batch perceptron should separate this")
  }
}
