package graft.run

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the q76 gram source: native word_grams kernel vs the
  * HOF (ArrayTransform) formulation, through the FULL heavyGrams pipeline.
  * Paired alternating rounds — the only measurement shape this
  * burst-throttled host supports (single wall numbers are meaningless;
  * CLAUDE.md invariant).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.run.KernelAb [--rounds 5]"
  */
object KernelAb {
  def main(args: Array[String]): Unit = {
    val (opts, _) = Cli.parse(args)
    val rounds = opts.getOrElse("--rounds", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(fn: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      graft.ops.HeavyHitters.heavyGramsWith(docs, n = 3, minCount = 100,
          d = 4, w = 1 << 17, textCol = "text", gramFn = fn)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once outside the measured rounds
    time(graft.ops.HeavyHitters.gramStrings)
    time(graft.ops.HeavyHitters.gramStringsHof)
    val (k, h) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (r <- 0 until rounds) {
      if (r % 2 == 0) { k += time(graft.ops.HeavyHitters.gramStrings)
                        h += time(graft.ops.HeavyHitters.gramStringsHof) }
      else            { h += time(graft.ops.HeavyHitters.gramStringsHof)
                        k += time(graft.ops.HeavyHitters.gramStrings) }
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.length / 2) }
    val (mk, mh) = (med(k.result()), med(h.result()))
    println(f"""{"kernel_sec":$mk%.2f,"hof_sec":$mh%.2f,"speedup":${mh / mk}%.2f,"rounds":$rounds}""")
    spark.stop()
  }
}
