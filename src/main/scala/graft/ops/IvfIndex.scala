package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nCentroids` cells; a query probes
  * only its `nProbe` nearest cells — search cost drops from O(corpus) to
  * O(corpus · nProbe / nCentroids) while the index build is one ML KMeans
  * fit (itself a Spark job, trainable on a sample at real scale).
  *
  * This is the scale path next to `Similarity.bruteForceTopK` (exact
  * baseline) and `Similarity.lshTopK` (hash path). All post-quantizer math is
  * DataFrame built-ins; the quantizer is spark.ml (deterministic via seed).
  */
object IvfIndex {

  case class Index(assigned: DataFrame /* vec_id, embedding, cell */,
                   centroids: DataFrame /* cell, centroid */)

  /** Build the index: fit k-means on the corpus (or a sample), assign every
    * vector to its nearest centroid cell. */
  def build(corpus: DataFrame, nCentroids: Int = 16, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding",
            fitFraction: Double = 1.0): Index = {
    val withVec = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val fitOn = if (fitFraction >= 1.0) withVec else withVec.sample(fitFraction, seed)
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(20).fit(fitOn)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    Index(assigned, centroids)
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
