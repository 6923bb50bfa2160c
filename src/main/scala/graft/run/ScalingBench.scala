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
  /** Measure ONE parallelism level in this JVM (fresh-JVM-per-level protocol:
    * JIT/GC state from a previous level otherwise contaminates the next).
    * Prints a single JSON line. */
  def measureMain(cpus: Int, nPages: Long, stage: String): Unit = {
    Bench.kgModelCached // train once, untimed
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("ERROR")
    def job(n: Long) =
      if (stage == "mentions") Bench.mentionThroughput(spark, n)
      else Bench.kgThroughput(spark, n)
    try {
      job(math.max(2000L, nPages / 10)) // warmup (JIT + codegen)
      val t0 = System.nanoTime()
      val (d, t, n) = job(nPages)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"cpus":$cpus,"pages":$nPages,"wall_sec":$wall%.2f,"docs_per_sec":$d%.1f,"triples_per_sec":$t%.1f,"triples":$n}""")
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val (opts, _) = Cli.parse(args)
    val nPages = opts.get("-p").orElse(opts.get("--pages")).map(_.toLong).getOrElse(20000L)
    opts.get("--measure").foreach { c =>
      measureMain(c.toInt, nPages, opts.getOrElse("--stage", "full")); return
    }
    val low = opts.getOrElse("--low", "8").toInt
    val high = opts.getOrElse("--high", "32").toInt
    val out = opts.getOrElse("--out", "BENCH.md")

    Bench.kgModelCached // train once, untimed
    val rounds = opts.getOrElse("--rounds", "3").toInt
    val stage = opts.getOrElse("--stage", "full") // full | mentions

    def job(spark: org.apache.spark.sql.SparkSession, n: Long) =
      if (stage == "mentions") Bench.mentionThroughput(spark, n)
      else Bench.kgThroughput(spark, n)

    // parallel utilization = Σ task executorRunTime / (wall × threads): a
    // HOST-INDEPENDENT check that the job actually keeps N threads busy.
    // On this burst-credit sandbox wall-clock ratios measure the host's CPU
    // grants as much as the code; utilization close to 1.0 at the high level
    // shows the pipeline parallelizes and the residual wall gap is the
    // host's, not a serial bottleneck in the plan.
    // cpuSec = JVM process CPU time actually consumed by the run — the
    // host-grant-independent measure of WORK. cpu_low ≈ cpu_high means the
    // 4× parallelism adds no wasted cycles (no contention/spill inflation);
    // the wall ratio is then set by the host's CPU grants, not the code.
    def measureOnce(cpus: Int, warm: Boolean): (Double, Double, Long, Double, Double, Double) = {
      val spark = Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("ERROR")
      val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) taskTime.addAndGet(te.taskMetrics.executorRunTime)
      }
      val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      try {
        if (warm) job(spark, math.max(2000L, nPages / 20)) // JIT + codegen
        spark.sparkContext.addSparkListener(listener)
        taskTime.set(0L)
        val cpu0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val (d, t, n) = job(spark, nPages)
        val wall = (System.nanoTime() - t0) / 1e9
        val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
        val util = (taskTime.get() / 1000.0) / (wall * cpus)
        (d, t, n, wall, util, cpuSec)
      } finally spark.stop()
    }

    // Host CPU availability fluctuates (shared sandbox with burst credits,
    // which DRAIN over a run) — so (a) interleave the two levels, (b)
    // ALTERNATE which level goes first each round (a fixed order
    // systematically hands the second level more-drained credits), and (c)
    // take the median of the PAIRED per-round efficiencies, which is robust
    // to slow drift that medians-of-walls are not.
    val samples = scala.collection.mutable.Map[Int, List[(Double, Double, Long, Double, Double, Double)]]()
      .withDefaultValue(Nil)
    val pairEffs = scala.collection.mutable.ListBuffer.empty[Double]
    for (r <- 0 until rounds) {
      val order = if (r % 2 == 0) Seq(low, high) else Seq(high, low)
      val walls = scala.collection.mutable.Map.empty[Int, Double]
      for (c <- order) {
        val m = measureOnce(c, warm = r == 0)
        System.err.println(f"[scaling] round $r cpus=$c wall=${m._4}%.1f s docs/s=${m._1}%.1f util=${m._5}%.3f cpu=${m._6}%.1f s")
        samples(c) = m :: samples(c)
        walls(c) = m._4
      }
      val e = (walls(low) / walls(high)) / (high.toDouble / low)
      System.err.println(f"[scaling] round $r paired efficiency = $e%.3f")
      pairEffs += e
    }
    def median(c: Int) = samples(c).sortBy(_._4).apply(samples(c).length / 2)
    val (dLow, tLow, n1, wallLow, utilLow, cpuLow) = median(low)
    val (dHigh, tHigh, n2, wallHigh, utilHigh, cpuHigh) = median(high)
    val workEff = cpuLow / cpuHigh
    require(n1 == n2, s"nondeterministic triple count: $n1 vs $n2")
    val eff = pairEffs.sorted.apply(pairEffs.length / 2)

    val md =
      f"""# BENCH — KG pipeline scaling evidence
         |
         |Protocol (BASELINE.md): identical job — pages → sentences → CRF
         |mentions → links → triples on $nPages%d generated pages (seed 42) — at
         |two parallelism levels in this sandbox standing in for N and 4N
         |executors. Triple counts are identical at both levels ($n1%d).
         |
         || parallelism | wall (s) | docs/sec | triples/sec | thread utilization | process CPU (s) |
         || --- | --- | --- | --- | --- | --- |
         || local[$low%d] | $wallLow%.1f | $dLow%.1f | $tLow%.1f | $utilLow%.3f | $cpuLow%.1f |
         || local[$high%d] | $wallHigh%.1f | $dHigh%.1f | $tHigh%.1f | $utilHigh%.3f | $cpuHigh%.1f |
         |
         |**Scaling efficiency = $eff%.3f** (median of paired per-round
         |(T_$low%d / T_$high%d) / ${high / low}%d; target ≥ 0.8). Per-round: ${pairEffs.map(e => f"$e%.3f").mkString(", ")}.
         |Thread utilization = Σ task executorRunTime / (wall × threads) —
         |host-independent evidence the job keeps all threads busy at both
         |levels (a serial bottleneck would show as utilization collapsing at
         |the higher level). **Work efficiency (CPU_$low%d / CPU_$high%d) =
         |$workEff%.3f**: total process CPU consumed for the SAME work at the
         |two levels — parallelization overhead, independent of the host's
         |CPU grants.
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), md)
    println(md)
    println(f"""{"scaling_efficiency":$eff%.3f,"work_efficiency":$workEff%.3f,"util_low":$utilLow%.3f,"util_high":$utilHigh%.3f,"low_cpus":$low,"high_cpus":$high,"docs_per_sec_low":$dLow%.1f,"docs_per_sec_high":$dHigh%.1f,"pages":$nPages}""")
  }
}
