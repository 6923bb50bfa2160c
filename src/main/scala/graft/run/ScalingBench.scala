package graft.run

import graft.Bench

/** Scaling-efficiency evidence (north_rule: throughput scaling ≥ 0.8 from N
  * to 4N executors; no real cluster in this sandbox — per BASELINE.md the
  * substitute is the same job at local[8] vs local[32] on identical input).
  *
  * Runs the KG throughput job at both parallelism levels in one JVM
  * (sequential SparkSessions), reports docs/sec + triples/sec at each and
  * efficiency = (T_low / T_high) / (cpus_high / cpus_low).
  *
  * Usage: ScalingBench [--pages N] [--low 8] [--high 32] [--out BENCH.md]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val (opts, _) = Cli.parse(args)
    val nPages = opts.get("-p").orElse(opts.get("--pages")).map(_.toLong).getOrElse(20000L)
    val low = opts.getOrElse("--low", "8").toInt
    val high = opts.getOrElse("--high", "32").toInt
    val out = opts.getOrElse("--out", "BENCH.md")

    Bench.kgModelCached // train once, untimed

    def measure(cpus: Int): (Double, Double, Long, Double) = {
      val spark = Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("ERROR")
      try {
        Bench.kgThroughput(spark, math.min(2000L, nPages)) // warmup (JIT + codegen)
        val t0 = System.nanoTime()
        val (d, t, n) = Bench.kgThroughput(spark, nPages)
        (d, t, n, (System.nanoTime() - t0) / 1e9)
      } finally spark.stop()
    }

    val (dLow, tLow, n1, wallLow) = measure(low)
    val (dHigh, tHigh, n2, wallHigh) = measure(high)
    require(n1 == n2, s"nondeterministic triple count: $n1 vs $n2")
    val eff = (wallLow / wallHigh) / (high.toDouble / low)

    val md =
      f"""# BENCH — KG pipeline scaling evidence
         |
         |Protocol (BASELINE.md): identical job — pages → sentences → CRF
         |mentions → links → triples on $nPages%d generated pages (seed 42) — at
         |two parallelism levels in this sandbox standing in for N and 4N
         |executors. Triple counts are identical at both levels ($n1%d).
         |
         || parallelism | wall (s) | docs/sec | triples/sec |
         || --- | --- | --- | --- |
         || local[$low%d] | $wallLow%.1f | $dLow%.1f | $tLow%.1f |
         || local[$high%d] | $wallHigh%.1f | $dHigh%.1f | $tHigh%.1f |
         |
         |**Scaling efficiency (T_$low%d / T_$high%d) / ${high / low}%d = $eff%.3f** (target ≥ 0.8).
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), md)
    println(md)
    println(f"""{"scaling_efficiency":$eff%.3f,"low_cpus":$low,"high_cpus":$high,"docs_per_sec_low":$dLow%.1f,"docs_per_sec_high":$dHigh%.1f,"pages":$nPages}""")
  }
}
