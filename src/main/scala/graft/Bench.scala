package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS, plus the KG pipeline's
  * docs/sec + triples/sec throughput. Prints ONE JSON line. */
object Bench {

  def session(cpus: String): SparkSession = {
    // SPARK_GRAFT_SHUFFLE_MULT > 1 gives each stage mult×cpus shuffle tasks:
    // with exactly cpus partitions a single straggler idles every other
    // thread for the stage tail; finer tasks pack the tail (the utilization
    // listener in ScalingBench showed ~33% idle at mult=1). AQE still
    // coalesces genuinely tiny partitions.
    val mult = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "1").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * mult).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_LOCAL_DIR=/dev/shm/... puts shuffle files on tmpfs for the
    // scaling runs: this single-VM sandbox shares ONE disk across all
    // threads, so disk-bound shuffle IO caps thread scaling in a way a real
    // cluster (per-executor disks, network that grows with N) does not.
    // Benchmark-methodology knob only; never set for the driver contract.
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d => b.config("spark.local.dir", d))
    b.getOrCreate()
  }

  /** KG throughput: pages → sentences → mentions → links → triples, all
    * in-memory (no checkpoint IO — this measures compute, not disk).
    * density=8 ⇒ ~38 sentences/page: realistic web-page-sized documents,
    * compute-dense relative to per-row shuffle overhead. */
  def kgThroughput(spark: SparkSession, nPages: Long, density: Int = 8): (Double, Double, Long) = {
    import spark.implicits._
    val model = kgModelCached
    val t0 = System.nanoTime()
    val pages = graft.kg.PagesGen.pages(spark, nPages, 42L, density = density)
    val sents = graft.kg.KgPipeline.sentences(pages)
    // partitions = -1: the generator's output is already evenly
    // url-distributed (same rationale as mentionThroughput), so the pre-CRF
    // url-hash repartition would shuffle every sentence's text for nothing —
    // the links stage's (url, sent_id) exchange right after is the one
    // shuffle this chain needs
    val mentions = graft.kg.KgPipeline.mentions(sents, model, partitions = -1)
    val links = graft.kg.KgPipeline.links(mentions, graft.kg.KgPipeline.aliasDf(spark))
    val triples = graft.kg.KgPipeline.triples(links, sents)
    val nTriples = triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    (nPages / wall, nTriples / wall, nTriples)
  }

  lazy val kgModelCached: graft.crf.CrfModel = graft.kg.KgPipeline.trainModel(42L)

  /** Extraction-only throughput: pages → sentences → CRF mentions (the
    * data-proportional stage that dominates at real corpus sizes). */
  def mentionThroughput(spark: SparkSession, nPages: Long, density: Int = 8): (Double, Double, Long) = {
    val model = kgModelCached
    val t0 = System.nanoTime()
    val pages = graft.kg.PagesGen.pages(spark, nPages, 42L, density = density)
    val sents = graft.kg.KgPipeline.sentences(pages)
    // partitions = -1: generator output is already evenly url-distributed
    val nMentions = graft.kg.KgPipeline.mentions(sents, model, partitions = -1).count()
    val wall = (System.nanoTime() - t0) / 1e9
    (nPages / wall, nMentions / wall, nMentions)
  }

  /** Curation-funnel throughput: synthesize `nDocs` web-text-like docs
    * in-Spark (deterministic, no driver data), run the scan-side gate
    * suite — stopword-heuristic language id, quality score, the native
    * repetition kernel — then PII redaction and the one-shuffle fingerprint
    * keep-first dedup, and count survivors. The curation counterpart of
    * [[kgThroughput]] for the N-vs-4N scaling protocol. (The gates listed
    * here are EXACTLY what runs — the measured chain is
    * `passesRepetitionFilter` + `corpusClean`.) */
  def curateThroughput(spark: SparkSession, nDocs: Long): (Double, Double, Long) = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // deterministic word-salad docs over a vocab with real stopwords so the
    // language gate has both passers and failers; ~60 words/doc
    val vocab = (graft.ops.TextStats.EnStopwords ++ Seq("table", "spark", "hash",
      "merge", "sort", "window", "batch", "scan", "row", "value", "key", "part",
      "fast", "slow", "line", "data", "join", "agg", "plan", "query")).toArray
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(59)),
        i => element_at(lit(vocab),
          (pmod(xxhash64(col("id") * 61 + i), lit(vocab.length)) + 1).cast("int"))))
        .as("text"))
    val gated = docs.filter(graft.ops.Quality.passesRepetitionFilter(col("text")))
    val survivors = graft.ops.Scrub.corpusClean(gated, minQuality = 0.3)
    val n = survivors.count()
    val wall = (System.nanoTime() - t0) / 1e9
    (nDocs / wall, n / wall, n)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong
    // ≥3 interleaved sweeps with per-query MEDIANS: this host duty-cycles CPU
    // with burst credits (BENCH.md), so a single sweep confounds a query's
    // cost with WHERE in the credit-drain cycle it ran — round 2's "q01
    // 2.5 s → 25.4 s regression" was exactly that artifact. Sweep order
    // alternates so position and query decorrelate across sweeps.
    val sweeps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_SWEEPS", "3").toInt)
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // train the CRF model once and warm the session (parquet reader, AQE,
    // codegen infra) outside the timed region — otherwise the first query
    // pays ~6 s of one-time setup
    kgModelCached
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // headline KG throughput FIRST: this host throttles sustained load
    // (BENCH.md), so whatever runs last eats drained burst credits
    val (docsPerSec, triplesPerSec, nTriples) = kgThroughput(spark, nPages)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val sweepTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (s <- 0 until sweeps) {
      // seeded per-sweep SHUFFLE (not alternate-reverse): with a fixed
      // alphabetical order the late-alphabet queries always land in the
      // depleted end of the host's burst-credit window — round 4 measured
      // the whole q64-q70 block inflated 3-15× with provably clean plans.
      // A different deterministic permutation per sweep decorrelates query
      // from position, so per-query medians stop encoding sweep position.
      val order = new scala.util.Random(1000 + s).shuffle(names)
      var tot = 0.0
      for (name <- order) {
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times(name)
        tot += dt
        // per-query persists (MinHash/SimHash/LmScore/cooccur) are never
        // shared across queries — release them so a 62-query sweep doesn't
        // accumulate executor cache to LRU-eviction pressure
        spark.sharedState.cacheManager.clearCache()
      }
      sweepTotals += tot
      System.err.println(f"[bench] sweep $s: $tot%.1f s")
    }
    val medians = names.map(n => n -> median(times(n)))

    val qs = medians.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val st = sweepTotals.map(t => f"$t%.3f").mkString("[", ",", "]")
    val json = f"""{"metric":"total_query_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sweeps":$sweeps,"sweep_totals":$st,"sf":"$sfDir","cpus":$cpus,"kg_pages":$nPages,"kg_docs_per_sec":$docsPerSec%.1f,"kg_triples_per_sec":$triplesPerSec%.1f,"kg_triples":$nTriples}"""
    // stdout (the driver's parse target — LAST line) AND a file: round 2's
    // BENCH_r02.json came back "parsed": null, so give the driver a clean
    // machine-readable copy next to the repo as well
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
