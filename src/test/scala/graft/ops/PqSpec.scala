package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for product quantization: codes bit-identical to a driver-side
  * reference of the same fixed-point Lloyd per subspace, compression
  * semantics (same code ⇔ same subvector cell), exact-integer ADC ranking
  * vs brute force on the quantized vectors, recall against true neighbors
  * on separable data, and partitioning independence end to end. */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Scale = 1000000L
  private val Dim = 8

  /** Three well-separated blobs per subspace half, deterministic jitter.
    * blobB is phased so seed ids 0,1,2 land in three DISTINCT blobs on BOTH
    * halves (min-id seeding needs that to converge blob-per-centroid). */
  private def blobA(id: Long) = id % 3
  private def blobB(id: Long) = (id + id / 3) % 3
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 120L).map { id =>
    val jit = (id % 7).toFloat / 1000f
    id -> Seq.tabulate(Dim) { d =>
      (if (d < Dim / 2) blobA(id) * 2f else blobB(id) * 2f) + jit + d * 0.01f
    }
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * Scale).toLong).toArray

  /** Driver-side Lloyd on quantized subvectors — mirrors Kmeans.fit. */
  private def refFit(sub: Seq[(Long, Array[Long])], k: Int, iters: Int): IndexedSeq[Array[Long]] = {
    var cents = sub.sortBy(_._1).take(k).map(_._2.clone).toIndexedSeq
    def argmin(q: Array[Long]) = cents.indices.minBy { j =>
      val c = cents(j)
      (q.indices.map(i => { val t = q(i) - c(i); t * t }).sum, j)
    }
    (1 to iters).foreach { _ =>
      val byC = sub.groupBy { case (_, q) => argmin(q) }
      cents = cents.indices.map { j =>
        byC.get(j).map { xs =>
          Array.tabulate(cents(j).length)(i =>
            math.floor(xs.map(_._2(i)).sum.toDouble / xs.length).toLong)
        }.getOrElse(cents(j))
      }
    }
    cents
  }

  private def refCodes(m: Int, k: Int, iters: Int): Map[Long, Seq[Long]] = {
    val subDim = Dim / m
    val subs = (0 until m).map { s =>
      val sub = vecs.map { case (id, v) => id -> quantize(v).slice(s * subDim, (s + 1) * subDim) }
      val cents = refFit(sub, k, iters)
      sub.map { case (id, q) =>
        id -> cents.indices.minBy { j =>
          val c = cents(j)
          (q.indices.map(i => { val t = q(i) - c(i); t * t }).sum, j)
        }.toLong
      }.toMap
    }
    vecs.map { case (id, _) => id -> subs.map(_(id)) }.toMap
  }

  test("codes bit-identical to the driver-side reference") {
    val cbs = Pq.fitCodebooks(df, m = 2, k = 3, iters = 4, dim = Dim)
    val got = Pq.encode(df, cbs, dim = Dim)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> Seq(r._2, r._3)).toMap
    assert(got === refCodes(m = 2, k = 3, iters = 4))
  }

  test("blob structure survives compression: same blob pair ⇒ same code pair") {
    val cbs = Pq.fitCodebooks(df, m = 2, k = 3, iters = 6, dim = Dim)
    val codes = Pq.encode(df, cbs, dim = Dim)
      .as[(Long, Long, Long)].collect()
    val byBlob = codes.groupBy { case (id, _, _) => (blobA(id), blobB(id)) }
    // every vector of a (blobA, blobB) cell lands on one (code0, code1)
    byBlob.foreach { case (cell, xs) =>
      assert(xs.map(x => (x._2, x._3)).toSet.size === 1, s"cell $cell split")
    }
    // and the 9 cells use all 3 codes on each side
    assert(codes.map(_._2).toSet.size === 3 && codes.map(_._3).toSet.size === 3)
  }

  test("ADC top-k matches brute force over the reconstructed distances") {
    val m = 2; val k = 3; val iters = 4; val topk = 7
    val queries = df.filter(col("vec_id") % 50 === 0)
    val got = Pq.adcTopK(df, queries, m, k, iters, topk, dim = Dim)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._3, x._4)).toSeq).toMap

    // brute force: same codebooks, same integer ADC, ranked (dist, vec_id)
    val subDim = Dim / m
    val cbs = Pq.fitCodebooks(df, m, k, iters, dim = Dim)
    val codes = refCodes(m, k, iters)
    val expect = vecs.collect { case (qid, qv) if qid % 50 == 0 =>
      val qq = quantize(qv)
      val scored = vecs.map { case (id, _) =>
        val d = (0 until m).map { s =>
          val c = cbs(s)(codes(id)(s).toInt)
          (0 until subDim).map { i => val t = qq(s * subDim + i) - c(i); t * t }.sum
        }.sum
        (id, d)
      }.sortBy { case (id, d) => (d, id) }.take(topk)
      qid -> scored
    }.toMap
    assert(got === expect)
  }

  test("recall on separable blobs: ADC top-k stays within the query's cell first") {
    val got = Pq.adcTopK(df, df.filter(col("vec_id") === 0), m = 2, k = 3,
      iters = 6, topk = 10, dim = Dim).as[(Long, Long, Long, Long)].collect()
    // query 0 is in cell (0,0); ~14 corpus vectors share it — all 10 results
    // must come from that cell (ADC distance there is strictly smallest)
    assert(got.forall { case (_, _, id, _) => blobA(id) == 0 && blobB(id) == 0 })
  }

  test("partitioning independence") {
    def at(parts: Int) =
      Pq.adcTopK(df.repartition(parts), df.filter(col("vec_id") % 50 === 0),
        m = 2, k = 3, iters = 4, topk = 7, dim = Dim)
        .as[(Long, Long, Long, Long)].collect().sortBy(x => (x._1, x._2)).toSeq
    assert(at(1) === at(9))
  }
}
