package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The bounded driver-local fits (k-means Lloyd loop, perceptron epochs)
  * must be BIT-IDENTICAL to the distributed aggregation paths. */
class LocalFitParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Key = "spark.graft.localIterMaxEdges"

  private def distributed[A](f: => A): A = {
    spark.conf.set(Key, "0")
    try f finally spark.conf.set(Key, "200000")
  }

  test("k-means fit local ≡ distributed (bit-exact centroids)") {
    val emb = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 31 + d * 7) % 100) / 100.0f).toArray.toSeq)
    }.toDF("vec_id", "embedding")
    val local = Kmeans.fit(emb, k = 5, iters = 4)
    val dist = distributed(Kmeans.fit(emb, k = 5, iters = 4))
    assert(local.map(_.toSeq) === dist.map(_.toSeq))
  }

  test("k-means fit local handles empty clusters like the distributed path") {
    // 2 distinct points, k=4: two clusters never receive a vector and must
    // keep their seed centroid on both paths
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(9.0f, 9.0f)), (4L, Seq(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val local = Kmeans.fit(emb, k = 4, iters = 3)
    val dist = distributed(Kmeans.fit(emb, k = 4, iters = 3))
    assert(local.map(_.toSeq) === dist.map(_.toSeq))
  }

  test("dupClusters local ≡ distributed") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 3L), (7L, 8L), (8L, 7L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.dupClusters(pairs).collect().map(_.toSeq).toSet
    val dist = distributed(Dedup.dupClusters(pairs).collect().map(_.toSeq).toSet)
    assert(local === dist)
    assert(local.contains(Seq(5L, 1L, false))) // 1-2-3-5 one component, min 1
  }

  test("perceptron train local ≡ distributed (bit-exact weights)") {
    val docs = (0 until 200).map { i =>
      val text = if (i % 3 == 0) "the cat is on the mat and it is a fine day"
      else s"zz$i qq ww ee rr tt yy uu!!!"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val f = Perceptron.features(docs)
    val local = Perceptron.train(f, epochs = 5)
    val dist = distributed(Perceptron.train(f, epochs = 5))
    assert(local.toSeq === dist.toSeq)
  }
}
