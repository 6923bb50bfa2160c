package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page (BASELINE.json `input_hint` schema:
  * url, warc_ts, html, text, lang). */
case class Page(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Gold mention for P/R scoring: char offsets into the page's sentence. */
case class GoldMention(url: String, sent_id: Int, start: Int, end: Int,
                       value: String, entity: String, entity_id: String)

/** Deterministic generator for the pages table (FIXTURES.md §6).
  *
  * Scale-first: generation is a `spark.range(n)` map — no driver-side
  * materialization, no global RNG (every draw is `splitmix64(seed ^ id)`), so
  * the same (seed, n) yields the same table at any parallelism, and the
  * generator itself scales linearly to arbitrarily many executors.
  *
  * Skew is built in deliberately (north_rule: skew handled explicitly): two
  * hot domains receive ~40% of all pages, the rest spread over a long tail —
  * so domain-keyed operations downstream exercise the salting path.
  */
object PagesGen {
  val HotDomains: IndexedSeq[String] = IndexedSeq("news.example.com", "blog.example.org")
  val TailDomainCount = 1000

  def domainFor(h: Long): String = {
    val r = ((h >>> 16) % 100 + 100) % 100
    if (r < 20) HotDomains(0)
    else if (r < 40) HotDomains(1)
    else s"site${((h >>> 32) % TailDomainCount + TailDomainCount) % TailDomainCount}.example.net"
  }

  /** Sentences per page: density × (2..9), deterministic. density=1 matches
    * the small fixtures; benches use higher densities for realistic
    * web-page-sized documents (compute-dense relative to shuffle rows). */
  private def sentCount(h: Long, density: Int): Int =
    ((((h >>> 24) % 8 + 8) % 8).toInt + 2) * density

  /** Canonical url of page j (pure function of (seed, j) — computable
    * without materializing the page). */
  def urlOf(seed: Long, j: Long): String =
    s"https://${domainFor(Synth.splitmix64(seed ^ j))}/page/$j"

  /** The pages page i hyperlinks to (deterministic, needs no corpus size):
    * a hub page (ids 0..9 — scale-free-ish in-degree on the hubs), the
    * sequential neighbor i+1 (dangling at the corpus edge, as on the real
    * web), and an ancestor i/2. Rendered as `<a href>` anchors WRAPPING
    * existing sentence words, so tag-stripping extraction reproduces the
    * page text byte-identically (the q56 invariant) while the html carries
    * a real link graph for [[WebGraph]]. */
  def linkTargets(i: Long, h: Long): IndexedSeq[Long] =
    IndexedSeq(((h >>> 48) % 10 + 10) % 10, i + 1, i / 2)

  /** First word of `s` wrapped in an anchor to `dst`. */
  private def anchorize(s: String, dst: String): String = {
    val idx = s.indexOf(' ')
    val (w, rest) = if (idx < 0) (s, "") else s.splitAt(idx)
    s"""<a href="$dst">$w</a>$rest"""
  }

  /** Global sentence index space: page i uses sentence ids [i*80, i*80+k). */
  def pageOf(seed: Long, i: Long, density: Int = 1): (Page, IndexedSeq[GoldMention]) = {
    val h = Synth.splitmix64(seed ^ i)
    val domain = domainFor(h)
    val url = s"https://$domain/page/$i"
    val nSents = math.min(sentCount(h, density), 80)
    val sents = (0 until nSents).map(k => Synth.sentence(seed, i * 80 + k))
    val text = sents.map(_.text).mkString("\n")
    val lang = if (((h >>> 40) % 10 + 10) % 10 == 9) "de" else "en"
    val ts = new java.sql.Timestamp(1672531200000L + (((h >>> 8) % 31536000L + 31536000L) % 31536000L) * 1000L)
    val targets = linkTargets(i, h)
    val bodyHtml = sents.zipWithIndex.map { case (s, k) =>
      if (k < targets.length) anchorize(s.text, urlOf(seed, targets(k))) else s.text
    }
    val html = (s"<html><head><title>page $i</title></head><body><p>" +
      bodyHtml.mkString("</p><p>") + "</p></body></html>").getBytes("UTF-8")
    val gold = sents.zipWithIndex.flatMap { case (s, k) =>
      s.spans.zip(s.ents).map { case (sp, (_, _, _, eid)) =>
        GoldMention(url, k, sp.start, sp.end, sp.value, sp.entity, eid)
      }
    }
    (Page(url, ts, html, text, lang), gold)
  }

  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            parallelism: Int = 0, density: Int = 1): Dataset[Page] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map(i => pageOf(seed, i, density)._1)
  }

  def gold(spark: SparkSession, n: Long, seed: Long = 42L,
           parallelism: Int = 0): Dataset[GoldMention] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    // non-English pages pass through untouched (input_hint) — they are out of
    // extraction scope, so they carry no gold mentions either
    spark.range(0, n, 1, p).flatMap { i =>
      val (page, g) = pageOf(seed, i)
      if (page.lang == "en") g else IndexedSeq.empty
    }
  }

  /** Training corpus for the pipeline model: free-text examples drawn from a
    * DISJOINT sentence-id space (negative branch) so the model never trains on
    * eval pages. */
  def trainingExamples(seed: Long, n: Int): IndexedSeq[graft.crf.Example] =
    (0 until n).map { k =>
      val s = Synth.sentence(seed, -1000000L - k)
      graft.crf.Example(s.text, IndexedSeq.empty, s.spans)
    }
}
