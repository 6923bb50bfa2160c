package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bucketing must actually remove the join shuffles: the same join planned
  * from plain parquet has exchanges on both sides; from tables bucketed on
  * the join key it has none. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")

    // baseline: plain-parquet join shuffles both sides (disable broadcast to
    // force the shuffle plan a big-big join would get)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plainJoin = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      assert(countExchanges(plainJoin) === 2, plainJoin.queryExecution.executedPlan.toString)

      BucketedTables.writeBucketed(lineitem, "li_bucketed", "l_orderkey", 8)
      BucketedTables.writeBucketed(orders, "ord_bucketed", "o_orderkey", 8)
      val bucketed = BucketedTables.colocatedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      assert(countExchanges(bucketed) === 0, bucketed.queryExecution.executedPlan.toString)

      // and the results are identical
      assert(bucketed.count() === plainJoin.count())

      // bucketed aggregation on the bucket key also skips its exchange
      val agg = BucketedTables.read(spark, "li_bucketed")
        .groupBy("l_orderkey").agg(count(lit(1)))
      assert(countExchanges(agg) === 0, agg.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
