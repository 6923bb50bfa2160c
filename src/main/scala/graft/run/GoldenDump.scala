package graft.run

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Regenerates the golden parquet pins that back the driver oracles for the
  * deterministic-but-not-SQL-expressible queries:
  *
  *  - KG stages (q50 mentions, q51 links, q52 triples, q53 canonical) —
  *    sf-INDEPENDENT (seeded page generator, bit-deterministic trainer,
  *    rounded confidences); pinned from sf0.001.
  *  - engine ops (q23 minhash, q24 simhash, q31 LSH, q32 embed-dups, q33 IVF,
  *    q41–q43 media) — deterministic given the seeded inputs (xxhash64
  *    signatures, hash-sampled driver-side k-means, seeded PNG/WAV synthesis,
  *    sorted/deduped pair sets) and INDEPENDENT of parallelism (gated by
  *    VerifySpec-style byte-equality across cpus in the repo's round notes);
  *    pinned from sf0.01 — the SF the driver's Verify gate runs at.
  *
  * The driver's DuckDB oracle for each is a plain `SELECT * FROM '<pin>'`.
  * GoldenKgSpec fails when a pipeline change drifts from the pins; rerun this
  * main to regenerate DELIBERATELY:
  *
  *   sbt -batch "runMain graft.run.GoldenDump"
  */
object GoldenDump {

  val GoldenKgDir = "/root/repo/src/test/resources/golden/kg"
  val GoldenOpsDir = "/root/repo/src/test/resources/golden/ops"

  val KgQueries: Seq[String] =
    Seq("q50_kg_mentions", "q51_kg_links", "q52_kg_triples", "q53_kg_canonical",
      "q54_kg_pagerank")
  val OpsQueries: Seq[String] =
    Seq("q23_minhash_pairs", "q24_simhash_pairs", "q31_ann_lsh", "q32_embed_dups",
      "q33_ann_ivf", "q41_media_decode", "q42_media_image", "q43_frame_sample",
      "q47_sketch_distinct")
  val GoldenQueries: Seq[String] = KgQueries ++ OpsQueries

  def goldenFile(name: String): String =
    if (KgQueries.contains(name)) s"$GoldenKgDir/$name.parquet"
    else s"$GoldenOpsDir/$name.parquet"

  /** Auxiliary pins: INPUTS to independent oracles, not query outputs —
    * e.g. q24's per-doc simhash signatures, which DuckDB brute-force-mines
    * into the full Hamming pair set (the signature kernel is xxhash64-based
    * and so not SQL-expressible, but the distributed pair MINING is what the
    * cross-engine check targets). Drift-gated in GoldenKgSpec like the
    * query pins. */
  val AuxPins: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "q24_simhash_sigs" -> graft.SparkEntry.simhashSigFrame,
      // q56's INPUT: the generated pages (url, html, text) — DuckDB re-runs
      // the whole html→text extraction on the pinned html bytes
      "q56_pages" -> ((s, _) =>
        graft.kg.PagesGen.pages(s, graft.SparkEntry.KgPages, 42L).toDF()
          .select("url", "html", "text")))

  def auxPinFile(name: String): String = s"$GoldenOpsDir/$name.parquet"

  /** The SF dir a pin is generated from — and the one the drift gate replays
    * at. KG queries ignore the dir (generated pages); ops queries read the
    * driver-verify tables, so their pins MUST come from sf0.01. */
  def sfDirFor(name: String): String =
    if (KgQueries.contains(name)) "/root/testdata/sf0.001" else "/root/testdata/sf0.01"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(GoldenKgDir))
    Files.createDirectories(Paths.get(GoldenOpsDir))
    val only = args.toSet
    def dumpOne(name: String, df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = Files.createTempDirectory(s"golden_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] wrote $dest")
    }
    GoldenQueries.filter(q => only.isEmpty || only.contains(q)).foreach { name =>
      dumpOne(name, graft.SparkEntry.queries(name)(spark, sfDirFor(name)), goldenFile(name))
    }
    AuxPins.filter { case (n, _) => only.isEmpty || only.contains(n) }.foreach {
      case (name, f) => dumpOne(name, f(spark, "/root/testdata/sf0.01"), auxPinFile(name))
    }
    spark.stop()
  }
}
