package graft.run

import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._

/** One-off stage-level wall profiler for the KG pipeline: persists each stage
  * boundary so the per-stage walls are additive, prints one line per stage
  * per parallelism level. Diagnostic tool behind the BENCH.md scaling work —
  * not part of the driver contract.
  *
  * Usage: StageProfile [--pages N] [--cpus 2,8]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val (opts, _) = Cli.parse(args)
    val nPages = opts.get("--pages").map(_.toLong).getOrElse(60000L)
    val cpusList = opts.getOrElse("--cpus", "2,8").split(",").map(_.trim.toInt)
    val model = graft.Bench.kgModelCached

    for (cpus <- cpusList) {
      val spark = graft.Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      try {
        // warmup
        graft.Bench.kgThroughput(spark, math.max(2000L, nPages / 20))
        def timed[T](label: String)(f: => T): T = {
          val t0 = System.nanoTime()
          val r = f
          println(f"[profile] cpus=$cpus stage=$label%-10s wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
          r
        }
        val pages = graft.kg.PagesGen.pages(spark, nPages, 42L, density = 8)
        val sents = graft.kg.KgPipeline.sentences(pages).persist(StorageLevel.MEMORY_AND_DISK)
        timed("sentences") { sents.count() }
        val mentions = graft.kg.KgPipeline.mentions(sents, model)
          .persist(StorageLevel.MEMORY_AND_DISK)
        timed("mentions") { mentions.count() }
        val links = graft.kg.KgPipeline.links(mentions, graft.kg.KgPipeline.aliasDf(spark))
          .persist(StorageLevel.MEMORY_AND_DISK)
        timed("links") { links.count() }
        val triples = graft.kg.KgPipeline.triples(links, sents)
        timed("triples") { triples.count() }
        if (opts.contains("--detail")) {
          val perSentence = links.groupBy($"url", $"sent_id")
            .agg(sort_array(collect_list(struct($"start", $"end", $"entity", $"entity_id", $"score"))).as("ms"))
            .filter(size($"ms") >= 2)
            .persist(StorageLevel.MEMORY_AND_DISK)
          timed("t.group") { perSentence.count() }
          val joined = perSentence.join(sents, Seq("url", "sent_id"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          timed("t.join") { joined.count() }
          perSentence.unpersist(); joined.unpersist()
        }
        val canonical = graft.kg.KgPipeline.canonical(mentions.as[graft.kg.MentionRow], links)
        timed("canonical") { canonical.count() }
        sents.unpersist(); mentions.unpersist(); links.unpersist()
      } finally spark.stop()
    }
  }
}
