package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nCentroids` cells; a query probes
  * only its `nProbe` nearest cells — search cost drops from O(corpus) to
  * O(corpus · nProbe / nCentroids).
  *
  * Quantizer design (the 100 TB path): the k-means FIT runs on the driver
  * over a bounded, deterministic sample — hash-mod filter (partitioning-
  * independent, unlike `Dataset.sample`'s per-partition RNG) capped at
  * `maxFitRows`, then seeded k-means++ and Lloyd iterations in a fixed order.
  * Fitting a coarse quantizer on a bounded sample is the standard IVF build
  * (centroid quality saturates long before corpus size); what must scale is
  * the ASSIGNMENT, which here is a pure map-side column expression (argmin
  * over `nCentroids` literal centroids — no shuffle, no ML pipeline, no UDF).
  * The whole build is bit-deterministic for a given (corpus, seed) at ANY
  * parallelism — required by the q33 golden-pin oracle.
  */
object IvfIndex {

  case class Index(assigned: DataFrame /* vec_id, embedding, cell */,
                   centroids: DataFrame /* cell, centroid */)

  /** Build the index: fit k-means on a deterministic bounded sample, assign
    * every vector to its nearest centroid cell via a column expression.
    * `fitFraction` < 1 is the corpus-scale setting: at 100 TB set it so the
    * hash filter passes ≲ `maxFitRows` rows; `maxFitRows` caps the driver
    * collect regardless. */
  def build(corpus: DataFrame, nCentroids: Int = 16, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding",
            fitFraction: Double = 1.0, maxFitRows: Int = 100000): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
    val frac = math.max(0.0, math.min(1.0, fitFraction))
    val filtered =
      if (frac >= 1.0) base
      else base.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) < lit((frac * 1000000L).toLong))
    val fitRows = filtered
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id")).limit(maxFitRows)
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(fitRows.nonEmpty, "empty fit sample — raise fitFraction")
    val cents = fitKMeans(fitRows, math.min(nCentroids, fitRows.length), seed)

    val assigned = base.withColumn("cell", nearestCell(col("embedding"), cents))
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    Index(assigned, centroids)
  }

  /** argmin over the literal centroid matrix — the native
    * [[graft.plans.IvfNearestCellExpression]] kernel (one generated call per
    * row; the previous per-centroid zip_with/aggregate folds were
    * interpreted lambdas). Identical IEEE operation order and lowest-cell
    * tie-break — the q33 pin stays bit-identical. Map-side only. */
  private def nearestCell(vec: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.IvfNearestCellExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), cents))

  /** Seeded k-means++ init + Lloyd, fixed iteration order on the driver —
    * bit-deterministic for a given (sample, seed). */
  private[ops] def fitKMeans(points: Array[Array[Double]], k: Int, seed: Long,
                             maxIter: Int = 20): Array[Array[Double]] = {
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding
    val cents = Array.ofDim[Array[Double]](k)
    cents(0) = points(rnd.nextInt(points.length)).clone()
    val minD = points.map(p => dist2(p, cents(0)))
    var c = 1
    while (c < k) {
      val total = minD.sum
      val target = rnd.nextDouble() * total
      var acc = 0.0
      var pick = points.length - 1
      var i = 0
      var done = false
      while (i < points.length && !done) {
        acc += minD(i)
        if (acc >= target) { pick = i; done = true }
        i += 1
      }
      cents(c) = points(pick).clone()
      var j = 0
      while (j < points.length) {
        val d = dist2(points(j), cents(c))
        if (d < minD(j)) minD(j) = d
        j += 1
      }
      c += 1
    }
    // Lloyd
    val assign = new Array[Int](points.length)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      moved = false
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = dist2(points(i), cents(0))
        var cc = 1
        while (cc < k) {
          val d = dist2(points(i), cents(cc))
          if (d < bestD) { bestD = d; best = cc }
          cc += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < points.length) {
        val a = assign(i); counts(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += points(i)(d); d += 1 }
        i += 1
      }
      var cc = 0
      while (cc < k) {
        // empty cluster keeps its previous centroid (deterministic; no resample)
        if (counts(cc) > 0) {
          var d = 0
          while (d < dim) { sums(cc)(d) /= counts(cc); d += 1 }
          cents(cc) = sums(cc)
        }
        cc += 1
      }
      it += 1
    }
    cents
  }

  /** Probe: for each query, rank all centroids by cosine (centroid table is
    * tiny → broadcast), keep the nProbe nearest cells, search only those
    * cells' vectors, return top-k by exact cosine. */
  def topK(index: Index, queries: DataFrame, k: Int = 5, nProbe: Int = 3,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // query norm once per query (not per probed pair) — the join boundary
    // keeps the norm expression out of the per-pair projection
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Similarity.norm(col(vecCol)).as("qn"))
    val cent = index.centroids.withColumn("cnorm", Similarity.norm(col("centroid")))
    val probed = q.join(broadcast(cent))
      .withColumn("ccos", Similarity.cosineWithNorms(col("qv"), col("centroid"), col("qn"), col("cnorm")))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("ccos"), asc("cell"))
    val cells = probed.withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val assigned = index.assigned.withColumn("en", Similarity.norm(col("embedding")))
    val scored = cells.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", Similarity.cosineWithNorms(col("qv"), col("embedding"), col("qn"), col("en")))
    graft.plans.TopK.perKey(scored, Seq(col("query_id")),
        Seq(desc("cos"), asc("vec_id")), k, rnName = "rnk")
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
