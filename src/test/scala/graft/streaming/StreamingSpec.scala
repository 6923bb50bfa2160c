package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.kg.{KgPipeline, Page, PagesGen}

/** Structured Streaming path: file-source pages stream → watermarked windowed
  * mention counts must equal the equivalent batch aggregation (micro-batch =
  * batch parity, since the decode transform is shared). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming windowed mention counts equal batch result") {
    val model = KgPipeline.trainModel(42L, nTrain = 200)
    val dir = java.nio.file.Files.createTempDirectory("pages_stream").toString
    PagesGen.pages(spark, 200, 42L).write.mode("overwrite").parquet(dir)

    val q = StreamingMentions.startOverParquetDir(spark, dir, model, "mention_counts_test")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT entity, sum(n_mentions) AS n FROM mention_counts_test GROUP BY entity")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val batch = StreamingMentions
      .windowedEntityCounts(spark.read.parquet(dir).as[Page], model)
      .groupBy("entity").agg(sum("n_mentions").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(streamed === batch)
    assert(streamed.values.sum > 100)
    assert(streamed.keySet === Set("PER", "ORG", "LOC"))
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = StreamingMentions.runningEntityTotals(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("totals_test").start()
    input.addData(("E1", 0.5), ("E1", 0.9), ("E2", 0.1))
    q.processAllAvailable()
    input.addData(("E1", 0.2))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM totals_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // update mode: last row per key wins
    val last = rows.groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    assert(last("E1") === ("E1", 3L, 0.9))
    assert(last("E2") === ("E2", 1L, 0.1))
  }
}
