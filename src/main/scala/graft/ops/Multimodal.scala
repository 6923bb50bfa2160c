package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in BATCHED per-partition passes (the JVM analogue of
  * `mapInPandas` batch processing — same schema/partitioning/batch-shape
  * concerns, Scala iterator instead of Arrow/pandas).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. The Spark-side plumbing — binary column handling, schema,
  * explicit repartition before the heavy stage, batch iteration — is real
  * and tested; swap `decodeStub` for a real codec on a cluster with native
  * libs. */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, mean_byte: Double)

  /** ===== STUB ===== deterministic fake decode: dimensions and a "feature"
    * derived from the payload bytes. A real implementation would decode the
    * codec here; everything around it stays identical. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val h = graft.kg.Synth.splitmix64(docId)
    val fmt = Array("jpeg", "png", "webp").apply(((((h >>> 3) % 3) + 3) % 3).toInt)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    MediaMeta(docId, bytes.length, fmt,
      64 + (((h >>> 8) % 512) + 512).toInt % 512,
      64 + (((h >>> 20) % 512) + 512).toInt % 512,
      math.round(mean * 100).toDouble / 100)
  }

  /** Attach a binary payload column (here: UTF-8 of the text standing in for
    * media bytes) — the input-shaping step a real ingest would do. */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Batched decode over partitions: explicit repartition (decode is the
    * expensive stage — spread it), then one iterator pass per partition. */
  def decodeMeta(docs: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .repartition(p, pmod(xxhash64(col("doc_id")), lit(p)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Pure-column metadata path (no decode needed): byte length + magic-number
    * sniffing pattern — stays entirely in codegen. */
  def payloadMeta(docs: DataFrame): DataFrame =
    withPayload(docs).select(col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      substring(base64(col("payload")), 1, 8).as("magic_b64"))
}
