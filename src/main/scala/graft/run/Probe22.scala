package graft.run

/** Throwaway distribution probe for the jaccard miner (guide §1.1). */
object Probe22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe22] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.SparkEntry.docsWithDups(spark, sfDir)
    val withSh = docs.select(col("doc_id"),
      graft.ops.Dedup.shingleHashes(col("text"), 3).as("sh"))
    time("shingle scan only") {
      withSh.write.mode("overwrite").format("noop").save()
    }
    val posting = withSh.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    time("posting noop") {
      posting.write.mode("overwrite").format("noop").save()
    }
    val df = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    val stats = time("df stats") {
      df.agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("n_postings"),
        max(col("df")).as("max_df"),
        sum(when(col("df").between(2, 2000), col("df") * (col("df") - 1) / 2)).as("pairs_capped"),
        sum(when(col("df") > 2000, 1)).as("n_over_cap")).collect()(0)
    }
    println(s"[probe22] $stats")
    val byShingle = posting.groupBy(col("shingle"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .filter(size(col("ds")).between(2, 2000))
    time("groupBy collect_list noop") {
      byShingle.write.mode("overwrite").format("noop").save()
    }
    val q22 = graft.ops.Dedup.jaccardPairs(docs, 0.8, 3, 2000)
    time("full q22 noop (warm)") {
      q22.write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
