package graft

/** Dev tool: dump formatted physical plans for key queries so the partition/
  * pushdown/broadcast story can be inspected (run via Test/runMain). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_agg", "q02_join_agg", "q03_broadcast_join", "q04_window_topn",
      "q21_dedup_exact", "q22_jaccard_pairs", "q30_ann_topk")
    val out = new StringBuilder
    for (n <- names) {
      out.append(s"\n===================== $n =====================\n")
      out.append(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans.txt"), out.result())
    println("wrote /tmp/plans.txt")
  }
}
