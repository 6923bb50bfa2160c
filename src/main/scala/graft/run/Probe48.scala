package graft.run

/** Throwaway stage probe for q48 (guide §1.1). */
object Probe48 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe48] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (rnd <- 0 until 2) {
      println(s"--- round $rnd")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      time("scan only")(docs.write.mode("overwrite").format("noop").save())
      val band = docs.withColumn("band",
        round(graft.ops.TextStats.qualityScore(col("text")) * 10, 0).cast("long"))
        .select("doc_id", "band")
      time("band only")(band.write.mode("overwrite").format("noop").save())
      val bucket = docs.select(col("doc_id"),
        graft.ops.Sampling.bucketHex(col("doc_id"), col("text")).as("bucket"))
      time("bucket md5 only")(bucket.write.mode("overwrite").format("noop").save())
      val full = graft.SparkEntry.queries("q48_quality_mixture")(spark, sfDir)
      time("full q48")(full.write.mode("overwrite").format("noop").save())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
