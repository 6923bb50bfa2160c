package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for web-graph construction: extraction parity with a JVM-regex
  * brute force over the generator html, the link-topology invariants the
  * generator plants (hub targets, neighbor, ancestor), text-extraction
  * compatibility (anchors must not perturb q56's byte-identity), and
  * hub dominance under PageRank. */
class WebGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val N = 120L
  private def pages = PagesGen.pages(spark, N, 42L).toDF()

  test("links matches a brute-force regex over the html, page by page") {
    val got = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val pat = java.util.regex.Pattern.compile(WebGraph.HrefPattern)
    val ref = (0L until N).map { i =>
      val p = PagesGen.pageOf(42L, i)._1
      val m = pat.matcher(new String(p.html, "UTF-8"))
      val links = Iterator.continually(m)
        .takeWhile(_.find()).map(mm => (mm.group(1), mm.group(2))).toSeq
      p.url -> links
    }.toMap
    assert(got.keySet === ref.filter(_._2.nonEmpty).keySet)
    ref.filter(_._2.nonEmpty).foreach { case (u, l) => assert(got(u) === l) }
  }

  test("every page links its planted targets: hub, neighbor i+1, ancestor i/2") {
    val got = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    (0L until N).foreach { i =>
      val h = Synth.splitmix64(42L ^ i)
      val page = PagesGen.pageOf(42L, i)._1
      val nSents = page.text.count(_ == '\n') + 1
      val expect = PagesGen.linkTargets(i, h).take(nSents)
        .map(j => PagesGen.urlOf(42L, j)).toSet
      assert(got(page.url) === expect, s"page $i")
    }
  }

  test("anchor markup never leaks into the extracted text (q56 invariant)") {
    val bad = pages
      .withColumn("extracted", HtmlText.htmlToText(col("html")))
      .filter(col("extracted") =!= col("text")).count()
    assert(bad === 0L)
  }

  test("hubs dominate the extracted-graph PageRank") {
    val ranked = WebGraph.pagerank(pages, iterations = 10)
      .orderBy(desc("rank_fp"), asc("node")).limit(15)
      .collect().map(_.getString(0)).toSet
    val hubs = (0L until 10L).map(j => PagesGen.urlOf(42L, j)).toSet
    assert(hubs.subsetOf(ranked),
      s"hubs missing from top-15: ${hubs.diff(ranked)}")
  }

  test("anchorProfile matches a brute-force recompute of the link list") {
    val linkRows = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def hostOf(u: String) = u.stripPrefix("https://").takeWhile(_ != '/')
    val ref = linkRows.groupBy(_._2).map { case (dst, rows) =>
      val byAnchor = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val (topA, topN) = byAnchor.toSeq.minBy { case (a, n) => (-n, a) }
      dst -> ((rows.length.toLong, byAnchor.size.toLong,
        rows.map(r => hostOf(r._1)).distinct.length.toLong, topA, topN))
    }
    val got = WebGraph.anchorProfile(pages).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    }.toMap
    assert(got === ref)
  }

  test("hostGraph totals are conserved: sum of n_links equals the edge count") {
    val total = WebGraph.links(pages).count()
    val hg = WebGraph.hostGraph(pages)
    assert(hg.agg(sum("n_links")).collect()(0).getLong(0) === total)
    // hot domains must appear as sources (generator plants ~40% there)
    val hosts = hg.select("src_host").distinct().collect().map(_.getString(0)).toSet
    PagesGen.HotDomains.foreach(d => assert(hosts.contains(d)))
  }

  test("triangles matches a brute-force enumeration") {
    val edges = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val ref = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      a <- nodes
      b <- adj(a).toSeq.sorted if b > a
      c <- (adj(a) intersect adj(b)).toSeq.sorted if c > b
    } { ref(a) += 1; ref(b) += 1; ref(c) += 1 }
    assert(ref.nonEmpty, "generator graph should contain triangles")
    val got = WebGraph.triangles(pages).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === ref.toMap)
  }

  test("clustering coefficient matches brute force; every node reports") {
    val edges = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref = adj.map { case (n, nb) =>
      val d = nb.size.toLong
      val t = nb.toSeq.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }.toLong
      n -> ((d, t, if (d < 2) 0.0
        else BigDecimal(t.toDouble * 2.0 / (d * (d - 1)).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = WebGraph.clusteringCoeff(pages).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === ref.keySet, "every node of the graph must report")
    assert(got === ref)
    assert(got.values.forall { case (_, _, cc) => cc >= 0.0 && cc <= 1.0 })
  }

  test("streaming link extraction equals batch exactly (stateless operator)") {
    val dir = java.nio.file.Files.createTempDirectory("pages_links").toString
    PagesGen.pages(spark, N, 42L).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Page].schema)
      .parquet(dir)
    val q = WebGraph.links(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("web_links_stream").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT src, dst, anchor FROM web_links_stream")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val batch = WebGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got === batch)
  }

  test("extraction is partition-invariant") {
    val a = WebGraph.links(pages).orderBy("src", "dst", "anchor").collect().toSeq
    val b = WebGraph.links(pages.repartition(7)).orderBy("src", "dst", "anchor").collect().toSeq
    assert(a === b)
  }
}
