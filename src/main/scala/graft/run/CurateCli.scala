package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg.Checkpoints
import graft.ops._

/** End-to-end corpus-curation job — the training-data counterpart of
  * PipelineCli: read a documents table (doc_id, text[, lang]), run the full
  * filter chain with checkpoint/resume per stage, write a survivors table
  * plus a per-stage funnel report.
  *
  * Stages (each a parquet dir + manifest under <outRoot>, resumable):
  *   stats      per-doc signals: quality, language heuristic, repetition
  *   clean      gate on quality + language + repetition; PII-redact survivors
  *   dedup      exact keep-first, then MinHash-LSH near-dup prune
  *   sample     deterministic md5-bucket mixture by language
  *   report.json  funnel counts per stage
  *
  * Usage: CurateCli <outRoot> --input <documents parquet> [--cpus N]
  *        [--quality 0.5] [--rate 0.5]
  */
object CurateCli {

  def main(args: Array[String]): Unit = {
    val (opts, pos) = Cli.parse(args)
    require(pos.length == 1, "usage: CurateCli <outRoot> --input <parquet> [--cpus N]")
    val outRoot = pos.head
    val input = opts.getOrElse("--input",
      sys.error("--input <documents parquet dir> is required"))
    val cpus = opts.getOrElse("--cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = PipelineCli.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, outRoot, input,
        minQuality = opts.get("--quality").map(_.toDouble).getOrElse(0.5),
        defaultRate = opts.get("--rate").map(_.toDouble).getOrElse(1.0))
      println(s"[curate] ${r.mkString(" ")}")
    } finally spark.stop()
  }

  /** Run the curation chain; returns the funnel as "stage=count" pairs. */
  def run(spark: SparkSession, outRoot: String, inputDir: String,
          minQuality: Double = 0.5, defaultRate: Double = 1.0,
          log: String => Unit = println): Seq[String] = {
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(inputDir)
    val hasLang = docs.columns.contains("lang")
    val nIn = docs.count()

    val stats = Checkpoints.stage(spark, outRoot, "stats", log) {
      docs.select(
        col("doc_id"),
        col("text"),
        (if (hasLang) col("lang") else lit("und")).as("lang"),
        TextStats.qualityScore(col("text")).as("quality"),
        TextStats.isEnglishHeuristic(col("text")).as("is_en"),
        Quality.passesRepetitionFilter(col("text")).as("passes_repetition"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.fingerprint(col("text")).as("fingerprint"))
    }

    val clean = Checkpoints.stage(spark, outRoot, "clean", log) {
      stats
        .filter(col("is_en") && col("quality") >= minQuality && col("passes_repetition"))
        .withColumn("clean_text", Scrub.redact(col("text")))
        .drop("text")
    }

    val deduped = Checkpoints.stage(spark, outRoot, "dedup", log) {
      // exact keep-first on the precomputed fingerprint, then MinHash-LSH
      // near-dup prune (keep the min doc_id of each near-dup pair's side)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      val exact = clean.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val pairs = Dedup.minhashDupPairs(
        exact.select(col("doc_id"), col("clean_text").as("text")), threshold = 0.9)
      val losers = pairs.select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct()
      exact.join(losers, Seq("doc_id"), "left_anti")
    }

    val sampled = Checkpoints.stage(spark, outRoot, "sample", log) {
      Sampling.stratifiedSample(deduped, "lang",
        rates = Map.empty, defaultRate = defaultRate, textCol = "clean_text")
    }

    val funnel = Seq(
      "input" -> nIn, "stats" -> stats.count(), "clean" -> clean.count(),
      "dedup" -> deduped.count(), "sample" -> sampled.count())
    val wall = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nIn / math.max(wall, 1e-9)
    // Locale.ROOT: the f-interpolator honors the JVM default locale — a
    // comma-decimal locale would render "wall_sec":12,3 (invalid JSON)
    def num(d: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outRoot/report.json"),
      (funnel.map { case (k, v) => s""""$k":$v""" } :+
        s""""wall_sec":${num(wall)}""" :+ s""""docs_per_sec":${num(docsPerSec)}""")
        .mkString("{", ",", "}"))
    log(s"[curate] wall=${num(wall)} s, ${num(docsPerSec)} docs/s through the funnel")
    funnel.map { case (k, v) => s"$k=$v" }
  }
}
