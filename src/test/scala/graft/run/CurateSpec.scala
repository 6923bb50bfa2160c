package graft.run

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** End-to-end curation pipeline: funnel must be monotone, planted dups must
  * die in the dedup stage, and resume must reproduce identical output. */
class CurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private var plantedSourceId: Long = -1L

  private lazy val inputDir: String = {
    // sf0.001 docs + planted exact dup + planted near-dup (survives exact,
    // must die in the MinHash stage)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    // the planted source must SURVIVE the clean gates (language + quality +
    // repetition), otherwise the dedup-kill assertions pass vacuously
    val keep = docs.filter(length(trim($"text")) > 50)
      .filter(graft.ops.TextStats.isEnglishHeuristic($"text"))
      .filter(graft.ops.TextStats.qualityScore($"text") >= 0.5)
      .filter(graft.ops.Quality.passesRepetitionFilter($"text"))
      .limit(1)
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)].head()
    plantedSourceId = keep._1
    val planted = Seq(
      (900001L, keep._2, keep._3),
      (900002L, keep._2 + " extraword", keep._3)).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("curate_in").toString
    docs.union(planted).write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val outRoot = java.nio.file.Files.createTempDirectory("curate_out").toString
  private lazy val funnel = CurateCli.run(spark, outRoot, inputDir, log = _ => ())

  private def counts: Map[String, Long] =
    funnel.map { s => val Array(k, v) = s.split("="); k -> v.toLong }.toMap

  test("funnel is monotone and every stage is materialized with a manifest") {
    val c = counts
    assert(c("input") > 0)
    assert(c("stats") === c("input"))
    assert(c("clean") <= c("stats") && c("clean") > 0)
    assert(c("dedup") <= c("clean"))
    assert(c("sample") === c("dedup")) // defaultRate = 1.0 keeps all
    for (st <- Seq("stats", "clean", "dedup", "sample"))
      assert(graft.kg.Checkpoints.isComplete(outRoot, st), s"stage $st")
  }

  test("planted exact and near duplicates die in the dedup stage") {
    funnel
    // the planted docs must REACH dedup (pass the clean gates) — otherwise
    // the kill assertions below are vacuous
    val cleaned = spark.read.parquet(s"$outRoot/clean").select("doc_id").as[Long].collect().toSet
    assert(cleaned.contains(900001L) && cleaned.contains(900002L) &&
      cleaned.contains(plantedSourceId), "planted docs must pass the clean gates")
    val surv = spark.read.parquet(s"$outRoot/dedup").select("doc_id").as[Long].collect().toSet
    assert(!surv.contains(900001L), "exact dup must lose to the original (min doc_id)")
    assert(!surv.contains(900002L), "near dup must be pruned by MinHash")
  }

  test("resume: invalidating a mid-chain stage reproduces identical survivors") {
    funnel
    def snap() = spark.read.parquet(s"$outRoot/sample")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val before = snap()
    graft.kg.Checkpoints.invalidate(outRoot, "dedup")
    graft.kg.Checkpoints.invalidate(outRoot, "sample")
    val again = CurateCli.run(spark, outRoot, inputDir, log = _ => ())
    assert(snap() === before)
    assert(again === funnel)
  }
}
