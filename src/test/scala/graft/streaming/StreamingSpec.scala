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

  test("streaming exact dedup drops duplicates within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "event_ts")
    val q = StreamingOps.dedupStream(docs)
      .writeStream.outputMode("append").format("memory").queryName("dedup_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    input.addData((1L, "hello world", ts(0)), (2L, "other text", ts(1)))
    q.processAllAvailable()
    // duplicate of doc 1 (same fingerprint after normalization) in batch 2
    input.addData((3L, "  Hello   WORLD ", ts(2)), (4L, "third text", ts(3)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM dedup_test").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L), "duplicate doc 3 must be dropped")
  }

  test("streaming near-dup dedup drops identical-simhash docs within the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "event_ts")
    val q = StreamingOps.nearDedupStream(docs)
      .writeStream.outputMode("append").format("memory").queryName("neardedup_test").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    input.addData((1L, base, ts(0)), (2L, "completely different text here", ts(1)))
    q.processAllAvailable()
    // simhash over unigram SETS: reordering tokens yields the identical
    // signature — the template near-dup the batch operator pairs at dist 0
    val reordered = (0 until 60).reverse.map(i => s"tok$i").mkString(" ")
    input.addData((3L, reordered, ts(2)), (4L, "yet another novel document", ts(3)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM neardedup_test").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L), "near-dup doc 3 (reordered tokens) must be dropped")
  }

  test("streaming sessionization closes sessions on event-time gaps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.sessionizeStream(input.toDS(), gapSec = 600, watermark = "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_test").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // u1: two events 5 min apart (one session), then a 30-min gap (new session)
    input.addData(("u1", ts(10, 0)), ("u1", ts(10, 5)), ("u2", ts(10, 0)))
    q.processAllAvailable()
    input.addData(("u1", ts(10, 35)))
    q.processAllAvailable()
    // advance the watermark far past every open session -> all close
    input.addData(("u3", ts(12, 0)))
    q.processAllAvailable()
    input.addData(("u3", ts(13, 0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, n_events FROM sess_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toList.sorted
    // u1: session(10:00,10:05)=2 events closed by the 10:35 event's gap,
    //     session(10:35)=1 closed by watermark; u2: 1; u3: first session
    //     closed once 13:00 advanced the watermark past 12:00+gap
    assert(rows.contains(("u1", 2L)))
    assert(rows.count(_._1 == "u1") === 2)
    assert(rows.contains(("u2", 1L)))
    assert(rows.contains(("u3", 1L)))
  }

  test("sessionization handles LATE events: backward-extend or separate earlier session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.sessionizeStream(input.toDS(), gapSec = 1800, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("late_sess_test").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // u1's session opens at 10:00; u2's at 10:05
    input.addData(("u1", ts(10, 0)), ("u2", ts(10, 5)))
    q.processAllAvailable()
    // LATE arrivals (within the 2h watermark):
    //  - u1 at 09:45: 15 min BEFORE the open session start, within gap ->
    //    must extend it backwards (NOT be glued with start=10:00)
    //  - u2 at 08:30: 1h35 before (inside the 2h watermark, beyond the
    //    30-min gap) -> its own earlier session, closed on merge
    input.addData(("u1", ts(9, 45)), ("u2", ts(8, 30)))
    q.processAllAvailable()
    // push the watermark far ahead so everything closes
    input.addData(("u3", ts(16, 0)))
    q.processAllAvailable()
    input.addData(("u3", ts(20, 0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT user_id, session_start, session_end, n_events FROM late_sess_test")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(rows.contains(("u1", ts(9, 45), ts(10, 0), 2L)),
      s"u1's late event must extend the session backwards; got $rows")
    assert(rows.contains(("u2", ts(8, 30), ts(8, 30), 1L)),
      s"u2's far-earlier event must be its own session; got $rows")
    assert(rows.contains(("u2", ts(10, 5), ts(10, 5), 1L)))
  }

  test("streaming corpus-clean: stateless gates drop gibberish/spam/contaminated, redact PII") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val fluent = "we walked to the store and bought some bread with a little cheese for the picnic in the park"
    val contaminated = "we note that the quick brown fox jumps over the lazy dog in this famous test sentence"
    val pii = "please contact the team at ops@example.com for all of the details about the new rollout plan"
    val gibberish = "zx qv wq jk pf lm zz xx cc vv bb nn mm qq ww ee rr tt"
    val spam = "buy buy buy buy buy buy buy buy buy buy buy buy buy buy"
    // benchmark shares the "the quick brown fox..." 8-grams with `contaminated`
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val benchHashes = StreamingOps.benchmarkGramHashes(bench)
    assert(benchHashes.size === 2) // 9 words -> two 8-grams

    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val q = StreamingOps.corpusCleanStream(docs, benchHashes)
      .writeStream.outputMode("append").format("memory").queryName("clean_stream_test").start()
    input.addData((1L, fluent), (2L, gibberish), (3L, spam))
    input.addData((4L, contaminated), (5L, pii))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT doc_id, clean_text FROM clean_stream_test")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set(1L, 5L),
      s"only the fluent and PII docs pass the gates; got ${rows.keySet}")
    assert(rows(1L) === fluent)
    assert(rows(5L).contains("[EMAIL]") && !rows(5L).contains("ops@example.com"))

    // micro-batch == batch parity: the same stateless gates over a batch DF
    val batch = StreamingOps.corpusCleanStream(
      Seq((1L, fluent), (2L, gibberish), (3L, spam), (4L, contaminated), (5L, pii))
        .toDF("doc_id", "text"), benchHashes)
      .select("doc_id", "clean_text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch === rows)
  }
}
