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
    val mentions = graft.kg.KgPipeline.mentions(sents, model)
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "20000").toLong
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total_query_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"kg_pages":$nPages,"kg_docs_per_sec":$docsPerSec%.1f,"kg_triples_per_sec":$triplesPerSec%.1f,"kg_triples":$nTriples}""")
    spark.stop()
  }
}
