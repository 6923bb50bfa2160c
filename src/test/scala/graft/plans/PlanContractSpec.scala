package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Plan contracts: the scale claims in PLANS.md, regression-gated. Each
  * assertion pins a property of the PHYSICAL plan (pruned read schema,
  * pushed filters, exchange counts) — a refactor that silently turns a
  * scan-rate operator into a shuffling one fails here, not in a benchmark
  * three rounds later. */
class PlanContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(plan: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size

  test("q36 repetition and q38 sampling are zero-exchange scan-side plans") {
    for (q <- Seq("q36_repetition", "q38_sample_mixture")) {
      val plan = physical(graft.SparkEntry.queries(q)(spark, sfDir))
      assert(exchanges(plan) === 0, s"$q must not shuffle:\n$plan")
    }
  }

  test("q20 textstats scan prunes to the referenced columns only") {
    val plan = physical(graft.SparkEntry.queries("q20_textstats")(spark, sfDir))
    val read = "ReadSchema: [^\n]+".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source") && !read.contains("n_chars"),
      s"unreferenced columns must be pruned from the scan: $read")
  }

  test("filters on the documents scan push down to the parquet reader") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") > 100L).select("doc_id", "lang")
    val plan = physical(df)
    assert(plan.contains("PushedFilters") &&
      ("PushedFilters: \\[[^\\]]*GreaterThan\\(doc_id,100\\)".r.findFirstIn(plan).isDefined),
      s"doc_id filter must reach the scan:\n$plan")
  }

  test("q39 bm25 plans as one stats pass + one scoring scan + bounded-heap top-k") {
    val plan = physical(graft.SparkEntry.queries("q39_bm25_search")(spark, sfDir))
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"),
      "ranking must use the bounded-heap operator, not a Window sort")
    assert(!plan.contains("Window"), "no window sort in the bm25 plan")
  }

  test("q37 contamination: corpus side shuffles only the doc_id aggregation") {
    val df = graft.SparkEntry.queries("q37_contamination")(spark, sfDir)
    val plan = physical(df)
    // one exchange for the bench-gram distinct (KB-scale), one for the final
    // per-doc aggregation; the corpus join side must be broadcast
    assert(plan.contains("BroadcastHashJoin"), "bench grams must broadcast")
    assert(exchanges(plan) <= 3, s"corpus must not shuffle more than agg+distinct:\n$plan")
  }
}
