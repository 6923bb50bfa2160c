package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the distributed fixed-point k-means: exact match against an
  * in-test brute-force integer reference (assignment AND distances),
  * partition invariance, blob purity, the empty-cluster carry rule, and
  * SemDeDup's within-cluster pair mining. */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Scale = 1000000L
  private val Dim = 8

  // --- brute-force fixed-point reference ---
  private def q(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * Scale).toLong)
  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def refKmeans(pts: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : (Map[Long, (Long, Long)], IndexedSeq[Array[Long]]) = {
    val qs = pts.sortBy(_._1).map { case (id, v) => id -> q(v) }
    var cents: IndexedSeq[Array[Long]] = qs.take(k).map(_._2.clone()).toIndexedSeq
    for (_ <- 1 to iters) {
      val assign = qs.map { case (id, v) =>
        (id, v, cents.indices.minBy(j => (d2(v, cents(j)), j)))
      }
      cents = cents.indices.map { j =>
        val members = assign.collect { case (_, v, a) if a == j => v }
        if (members.isEmpty) cents(j)
        else Array.tabulate(members.head.length) { i =>
          math.floor(members.map(_(i)).sum.toDouble / members.length).toLong
        }
      }
    }
    val fin = qs.map { case (id, v) =>
      val j = cents.indices.minBy(j => (d2(v, cents(j)), j))
      id -> ((j.toLong, d2(v, cents(j))))
    }.toMap
    (fin, cents)
  }

  // deterministic 3-blob corpus
  private val blobPts: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    val centers = Seq(Array.fill(Dim)(10f), Array.fill(Dim)(-10f),
      Array.tabulate(Dim)(i => if (i % 2 == 0) 10f else -10f))
    (0L until 90L).map { id =>
      val c = centers((id % 3).toInt)
      id -> c.map(x => x + (rnd.nextFloat() - 0.5f))
    }
  }
  private def blobDf = blobPts.map { case (id, v) => (id, v.toSeq) }
    .toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("cluster matches the brute-force fixed-point reference exactly") {
    val (ref, _) = refKmeans(blobPts, k = 3, iters = 4)
    val got = Kmeans.cluster(blobDf, k = 3, iters = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === ref)
  }

  test("assignment is partition-invariant") {
    val cents = Kmeans.fit(blobDf, k = 3, iters = 4)
    val a = Kmeans.assign(blobDf, cents).orderBy("vec_id").collect().toSeq
    val b = Kmeans.assign(blobDf.repartition(7), cents).orderBy("vec_id").collect().toSeq
    assert(a === b)
    val c2 = Kmeans.fit(blobDf.repartition(7), k = 3, iters = 4)
    assert(cents.map(_.toSeq) === c2.map(_.toSeq))
  }

  test("planted blobs come out pure: one cluster per blob") {
    val got = Kmeans.cluster(blobDf, k = 3, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byBlob = got.groupBy { case (id, _) => id % 3 }.view
      .mapValues(_.map(_._2).distinct).toMap
    byBlob.values.foreach(cl => assert(cl.length === 1))
    assert(byBlob.values.map(_.head).toSet.size === 3)
  }

  test("an empty cluster keeps its previous centroid") {
    // 4 identical points, k=2: both seeds identical, ties go to cluster 0,
    // cluster 1 never gets members and must carry its seed unchanged
    val same = (0L until 4L).map(id => (id, Seq.fill(Dim)(1.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Kmeans.fit(same, k = 2, iters = 3)
    assert(cents(0).toSeq === cents(1).toSeq)
    val a = Kmeans.assign(same, cents).collect()
    a.foreach(r => assert(r.getLong(1) === 0L))
  }

  test("semDedupPairs finds planted within-cluster near-duplicates") {
    val base = blobDf
    val pert = base.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), (v, i) =>
        (v + when(i === 0, lit(0.01f)).otherwise(lit(0.0f))).cast("float")).as("embedding"))
    val all = base.union(pert)
    val pairs = Kmeans.semDedupPairs(all, k = 3, iters = 4, threshold = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // every planted (id, id+1000) pair is a same-cluster near-dup
    blobPts.foreach { case (id, _) => assert(pairs.contains((id, id + 1000L))) }
    // and nothing below the threshold leaks through
    val vals = Kmeans.semDedupPairs(all, k = 3, iters = 4, threshold = 0.999)
      .collect().map(_.getDouble(3))
    vals.foreach(v => assert(v >= 0.999))
  }

  test("clusterBalancedSample takes exactly cap per cluster in md5 order") {
    val got = Kmeans.clusterBalancedSample(blobDf, k = 3, iters = 4, cap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 15)
    got.groupBy(_._1).foreach { case (_, rows) => assert(rows.length === 5) }
    // replay: within each cluster the picks are the md5-smallest vec_ids
    val assign = Kmeans.cluster(blobDf, k = 3, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def md5hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ref = assign.groupBy(_._2).toSeq.flatMap { case (c, members) =>
      members.map(_._1).sortBy(id => (md5hex(id), id)).take(5).zipWithIndex
        .map { case (id, i) => (c, i.toLong + 1, id) }
    }.toSet
    assert(got.toSet === ref)
  }

  test("maxCluster cap deterministically skips oversized clusters") {
    val pairs = Kmeans.semDedupPairs(blobDf, k = 3, iters = 4,
      threshold = 0.0, maxCluster = 10L)
    assert(pairs.count() === 0L) // every blob cluster has 30 > 10 members
  }
}
