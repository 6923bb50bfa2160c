package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for URL canonicalization: a table of literal crawl variants with
  * hand-written expected normal forms (the semantics contract), the
  * must-NOT-normalize cases (path case, non-tracking params, non-default
  * ports), dedup family grouping, and partitioning independence. */
class UrlNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlNorm.normalize(col("u"))).as[String].head()

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTPS://Example.COM/Docs/A") === "https://example.com/Docs/A")
  }

  test("www., default ports, fragments stripped") {
    assert(norm("https://www.example.com:443/a#frag") === "https://example.com/a")
    assert(norm("HTTP://WWW.Example.com:80/a?id=1#x") === "http://example.com/a?id=1")
  }

  test("non-default port and non-tracking params survive") {
    assert(norm("https://example.com:8443/a?page=2&sort=asc")
      === "https://example.com:8443/a?page=2&sort=asc")
  }

  test("http port 443 is NOT default and survives") {
    assert(norm("http://example.com:443/a") === "http://example.com:443/a")
  }

  test("tracking params stripped in first, middle, last, and only positions") {
    assert(norm("https://e.com/a?utm_source=f&id=3") === "https://e.com/a?id=3")
    assert(norm("https://e.com/a?id=3&fbclid=zz&q=w") === "https://e.com/a?id=3&q=w")
    assert(norm("https://e.com/a?id=3&gclid=zz") === "https://e.com/a?id=3")
    assert(norm("https://e.com/a?utm_campaign=only") === "https://e.com/a")
    assert(norm("https://e.com/a?utm_a=1&utm_b=2&utm_c=") === "https://e.com/a")
  }

  test("kept param ORDER is preserved (delete-only normalization)") {
    assert(norm("https://e.com/a?z=1&utm_x=0&a=2") === "https://e.com/a?z=1&a=2")
  }

  test("a tracking NAME inside another param's value is untouched") {
    assert(norm("https://e.com/a?q=see+utm_source+docs&id=1")
      === "https://e.com/a?q=see+utm_source+docs&id=1")
  }

  test("/index.html and trailing slash stripped, with and without query") {
    assert(norm("https://e.com/d/index.html") === "https://e.com/d")
    assert(norm("https://e.com/d/index.html?id=1") === "https://e.com/d?id=1")
    assert(norm("https://e.com/d/") === "https://e.com/d")
    assert(norm("https://e.com/d/?id=1") === "https://e.com/d?id=1")
    assert(norm("https://e.com/") === "https://e.com")
  }

  test("host extraction from the normal form") {
    val h = Seq("https://sub.example.com:8443/a?x=1").toDF("u")
      .select(UrlNorm.host(UrlNorm.normalize(col("u")))).as[String].head()
    assert(h === "sub.example.com:8443")
  }

  test("dedupByUrl groups the whole variant family onto one canonical row") {
    val variants = Seq(
      1L -> "HTTPS://WWW.Example.COM:443/Page/7?utm_source=a&id=4#top",
      2L -> "https://example.com/Page/7/index.html?id=4&fbclid=b",
      3L -> "https://example.com/Page/7/?id=4",
      9L -> "https://example.com/Other?id=4")
    val out = UrlNorm.dedupByUrl(variants.toDF("doc_id", "url"))
      .select("doc_id", "url_norm", "canonical", "n_dups")
      .as[(Long, String, Boolean, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).take(3).toSet === Set("https://example.com/Page/7?id=4"))
    assert(out.map(x => x._1 -> x._3).toMap === Map(1L -> true, 2L -> false,
      3L -> false, 9L -> true))
    assert(out.map(_._4).toSeq === Seq(3L, 3L, 3L, 1L))
  }

  test("partitioning independence") {
    val df = spark.range(0, 400).select(col("id").as("doc_id"),
      concat(lit("https://h"), (col("id") % 37).cast("string"),
        lit(".com/p/"), (col("id") % 37).cast("string"),
        when(col("id") % 2 === 0, "/index.html").otherwise("/"),
        lit("?utm_x="), col("id").cast("string")).as("url"))
    def run(parts: Int) = UrlNorm.dedupByUrl(df.repartition(parts))
      .select("doc_id", "url_norm", "canonical", "n_dups")
      .as[(Long, String, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(13))
  }
}
