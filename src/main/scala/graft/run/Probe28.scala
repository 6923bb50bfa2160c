package graft.run

/** Throwaway stage-breakdown probe for q28 (guide §1.1): times each piece
  * of the dupClusters chain in isolation. Not part of any contract. */
object Probe28 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe28] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 0 until 2) {
      println(s"--- round $round")
      val docs = graft.SparkEntry.docsWithDups(spark, sfDir)
      val pairs = graft.ops.Dedup.jaccardPairs(docs, threshold = 0.8, n = 3, maxDf = 2000)
      time("jaccardPairs noop") {
        pairs.write.mode("overwrite").format("noop").save()
      }
      val pairs2 = graft.ops.Dedup.jaccardPairs(docs, threshold = 0.8, n = 3, maxDf = 2000)
      val edges = time("edges localCheckpoint") {
        pairs2.select(lpad(col("doc_a").cast("string"), 20, "0").as("node_a"),
          lpad(col("doc_b").cast("string"), 20, "0").as("node_b")).localCheckpoint()
      }
      val sym = time("sym checkpoint") {
        edges.select(col("node_a").as("a"), col("node_b").as("b"))
          .union(edges.select(col("node_b").as("a"), col("node_a").as("b")))
          .distinct().localCheckpoint()
      }
      val cnt = time("sym count")(sym.count())
      println(s"[probe28] sym edges: $cnt")
      val nodes = edges.select(col("node_a").as("node"))
        .union(edges.select(col("node_b").as("node"))).distinct()
      val cc = time("cc run") {
        graft.kg.ConnectedComponents.run(nodes, edges)
      }
      time("cc noop + select") {
        cc.select(col("node").cast("long").as("doc_id"),
          substring(col("canon_id"), 3, 20).cast("long").as("cluster_id"))
          .withColumn("kept", col("doc_id") === col("cluster_id"))
          .write.mode("overwrite").format("noop").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
