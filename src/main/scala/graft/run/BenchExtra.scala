package graft.run

import org.apache.spark.sql.SparkSession

/** Targeted re-measurement harness for optimization work — NOT the driver
  * contract (graft.Bench is frozen): times a named subset of SparkEntry
  * queries with the same noop-sink methodology, several interleaved rounds,
  * and prints per-query min/median so before/after probes are robust to
  * this host's burst-credit throttling (BENCH.md doctrine).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        sbt "runMain graft.run.BenchExtra [--rounds 3] q22_jaccard_pairs ..."
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val (opts, names) = Cli.parse(args)
    val rounds = opts.getOrElse("--rounds", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.kgModelCached // outside the timed region, like Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val targets = if (names.nonEmpty) names else graft.SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 0 until rounds) {
      val order = new scala.util.Random(2000 + r).shuffle(targets)
      for (name <- order) {
        spark.sparkContext.setJobDescription(s"bench-extra: $name round $r")
        val t0 = System.nanoTime()
        try { graft.SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable => System.err.println(s"[bench-extra] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times(name)
        spark.sharedState.cacheManager.clearCache()
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    targets.sorted.foreach { n =>
      val xs = times(n)
      println(f"[bench-extra] $n%-24s min=${xs.min}%.3f median=${median(xs)}%.3f samples=${xs.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
