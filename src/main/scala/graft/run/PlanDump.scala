package graft.run

import org.apache.spark.sql.SparkSession

/** Plan-efficiency audit tool: prints the formatted physical plan of named
  * SparkEntry queries plus a one-line summary of the shapes that matter at
  * 100 TB — parquet scan count, exchange count, whole-stage-codegen spans.
  *
  * Usage: sbt "runMain graft.run.PlanDump q44_lm_score [q39_bm25_search ...]"
  *        (optional first arg --sf <dir>, default /root/testdata/sf0.01)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (opts, names) = Cli.parse(args)
    val sfDir = opts.getOrElse("--sf", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = if (names.nonEmpty) names else graft.SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      // count node DEFINITIONS ("(7) Scan parquet"), not tree references —
      // formatted mode prints a reused node once and references it by id
      def defs(p: String) = ("(?m)^\\(\\d+\\) " + p).r.findAllIn(plan).length
      println(s"[plandump] $name scans=${defs("Scan parquet")} " +
        s"inMemoryScans=${defs("InMemoryTableScan")} " +
        s"exchanges=${defs("Exchange")} " +
        s"codegenSpans=${"codegen id : \\d+".r.findAllIn(plan).toSeq.distinct.length}")
    }
    spark.stop()
  }
}
