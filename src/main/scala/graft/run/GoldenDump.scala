package graft.run

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Regenerates the golden parquet pins for the deterministic KG-stage queries
  * (q50 mentions, q51 links, q52 triples, q53 canonical). The driver's DuckDB
  * oracle for these stages is a plain `SELECT * FROM '<golden file>'` — valid
  * because everything upstream is seeded and bit-deterministic (seeded page
  * generator, the local bit-deterministic trainer, confidence/score rounded
  * to 4 decimals). GoldenKgSpec fails when a pipeline change drifts from the
  * pins; rerun this main to regenerate DELIBERATELY:
  *
  *   sbt -batch "runMain graft.run.GoldenDump"
  */
object GoldenDump {

  val GoldenDir = "/root/repo/src/test/resources/golden/kg"
  val GoldenQueries: Seq[String] =
    Seq("q50_kg_mentions", "q51_kg_links", "q52_kg_triples", "q53_kg_canonical")

  def goldenFile(name: String): String = s"$GoldenDir/$name.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(GoldenDir))
    GoldenQueries.foreach { name =>
      val tmp = Files.createTempDirectory(s"golden_$name").toString
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, Paths.get(goldenFile(name)), StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] wrote ${goldenFile(name)}")
    }
    spark.stop()
  }
}
