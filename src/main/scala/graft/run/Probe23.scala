package graft.run

/** Throwaway stage-breakdown probe for q23 minhash LSH (guide §1.1). */
object Probe23 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe23] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (round <- 0 until 2) {
      println(s"--- round $round")
      val docs = graft.SparkEntry.docsWithDups(spark, sfDir)
      val sig = docs.select(col("doc_id"), graft.ops.Dedup.minhashSignature(col("text"), 32, 3).as("sig"))
      time("signature noop")(sig.write.mode("overwrite").format("noop").save())
      val banded = sig
        .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(7))).as("band"))
        .select(col("doc_id"), col("band"),
          xxhash64((1 to 4).map(j => element_at(col("sig"), col("band") * 4 + j)): _*).as("bucket"))
      time("banded noop")(banded.write.mode("overwrite").format("noop").save())
      val cand0 = banded.groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 200))
      time("cand groups noop")(cand0.write.mode("overwrite").format("noop").save())
      val full = graft.ops.Dedup.minhashDupPairs(docs, threshold = 0.8)
      time("full q23 noop")(full.write.mode("overwrite").format("noop").save())
      val n = full.count()
      println(s"[probe23] pairs: $n")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
