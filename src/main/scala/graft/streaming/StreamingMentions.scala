package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.crf.CrfModel
import graft.kg.{KgPipeline, MentionRow, Page, SentenceRow}

/** Structured Streaming surface for the KG pipeline: incremental mention
  * extraction over a stream of pages (`readStream` → transforms →
  * `writeStream`), watermarked tumbling-window aggregation, and custom
  * per-entity running state via `mapGroupsWithState`.
  *
  * The reference is batch-only (its `serve.py` is request/response), so this
  * is an engine-side addition: the same broadcast-model `mapPartitions`
  * decode runs unchanged inside micro-batches — batch/streaming parity by
  * construction (the Dataset transform is shared with `KgPipeline`).
  */
object StreamingMentions {

  /** pages stream → mentions stream (same decode path as batch). */
  def mentionStream(pages: Dataset[Page], model: CrfModel): Dataset[MentionRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // streaming Datasets forbid repartition-by-expression pre-shuffle; the
    // micro-batch source partitioning stands in for it (partitions = -1)
    val sents = KgPipeline.sentences(pages)
    KgPipeline.mentions(sents, model, partitions = -1)
  }

  /** Watermarked tumbling-window mention counts per entity kind:
    * (window, entity) → count, 10-minute windows, 30-minute watermark. */
  def windowedEntityCounts(pages: Dataset[Page], model: CrfModel): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val withTs = pages.withWatermark("warc_ts", "30 minutes")
    // model crosses as a BROADCAST (not a closure capture): each micro-batch
    // deserializes a fresh task closure, so a captured model would be a new
    // object per batch and forModel's identity-keyed decoder cache would
    // rebuild every batch — the broadcast value is per-executor-stable, so
    // the warmed decoder really is reused across rows AND micro-batches
    // (same discipline as StreamingTriples.rawTripleStream)
    val bcModel = spark.sparkContext.broadcast(model)
    val mentions = withTs.as[Page].mapPartitions { iter =>
      val decoder = graft.crf.CrfDecoder.forModel(bcModel.value)
      iter.flatMap { p =>
        if (p.lang != "en") Iterator.empty
        else p.text.split('\n').iterator.flatMap(s => decoder.process(s))
          .map(sp => (p.warc_ts, sp.entity))
      }
    }.toDF("warc_ts", "entity")
    mentions
      .groupBy(window(col("warc_ts"), "10 minutes"), col("entity"))
      .agg(count(lit(1)).as("n_mentions"))
  }

  case class EntityRunning(entity_id: String, total: Long, max_score: Double)

  /** Custom streaming state: running per-entity totals via mapGroupsWithState
    * (the engine-side analogue of the north_rule's counter metrics, kept
    * incrementally correct across micro-batches). */
  def runningEntityTotals(links: Dataset[(String, Double)]): Dataset[EntityRunning] = {
    val spark = links.sparkSession
    import spark.implicits._
    links.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[(String, Double)], state: GroupState[EntityRunning]) =>
          val prev = state.getOption.getOrElse(EntityRunning(id, 0L, 0.0))
          var total = prev.total
          var mx = prev.max_score
          rows.foreach { case (_, s) => total += 1; mx = math.max(mx, s) }
          val next = EntityRunning(id, total, mx)
          state.update(next)
          next
      }
  }

  /** Run the streaming mention counter over a directory of page parquet files
    * (file-source streaming) to a memory sink; returns the query name. */
  def startOverParquetDir(spark: SparkSession, pagesDir: String, model: CrfModel,
                          queryName: String = "mention_counts"): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Page].schema)
      .parquet(pagesDir)
      .as[Page]
    windowedEntityCounts(pages, model)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
