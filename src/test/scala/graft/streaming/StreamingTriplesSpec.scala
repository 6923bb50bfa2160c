package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.kg.{KgPipeline, Page, PagesGen}

/** Streaming triple construction must agree with the batch pipeline: the
  * stateless per-page chain (decode → link → relate) rolled up per
  * (subj, pred, obj) equals batch `KgPipeline.triples` on the same pages. */
class StreamingTriplesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val model = KgPipeline.trainModel(42L, nTrain = 200)

  test("streaming raw triples roll up to the batch triple table exactly") {
    val nPages = 200L
    val dir = java.nio.file.Files.createTempDirectory("pages_triples").toString
    PagesGen.pages(spark, nPages, 42L).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Page].schema)
      .parquet(dir).as[Page]
    val q = StreamingTriples.rawTripleStream(stream, model)
      .writeStream.outputMode("append").format("memory")
      .queryName("raw_triples_test").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      """SELECT subj, pred, obj, count(*) AS n_sources, max(conf) AS conf
         FROM raw_triples_test GROUP BY 1, 2, 3""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap

    val pages = spark.read.parquet(dir).as[Page]
    val sents = KgPipeline.sentences(pages)
    val links = KgPipeline.links(KgPipeline.mentions(sents, model), KgPipeline.aliasDf(spark))
    val batch = KgPipeline.triples(links, sents)
      .select($"subj", $"pred", $"obj", $"n_sources", $"conf")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap

    assert(streamed.size === batch.size)
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.values.map(_._1).sum > 100)
  }

  test("windowed rollup: watermarked aggregation emits per-window counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val input = MemoryStream[StreamingTriples.RawTriple]
    val q = StreamingTriples.windowedTripleRollup(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("triple_rollup_test").start()
    input.addData(
      StreamingTriples.RawTriple("PER:A", "works_at", "ORG:X", "u1", 0.5, ts(1)),
      StreamingTriples.RawTriple("PER:A", "works_at", "ORG:X", "u2", 0.9, ts(5)),
      StreamingTriples.RawTriple("PER:B", "met", "PER:C", "u3", 0.4, ts(12)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT subj, pred, obj, n_sources, conf FROM triple_rollup_test")
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    assert(rows.contains(("PER:A", "ORG:X", 2L, 0.9))) // same 10-min window, merged
    assert(rows.contains(("PER:B", "PER:C", 1L, 0.4)))
  }
}
