package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** html → text extraction gates: byte-identical recovery of the page text
  * from the html bytes (the north rule's per-url invariant, now proven from
  * the markup side), handcrafted markup semantics, and pipeline parity for
  * the --from-html mode. */
class HtmlTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("generated pages: extraction reproduces page text byte-identically") {
    val pages = PagesGen.pages(spark, 300L, 42L).toDF()
    val mismatches = pages
      .withColumn("extracted", HtmlText.htmlToText(col("html")))
      .filter(col("extracted") =!= col("text"))
      .count()
    assert(mismatches === 0L)
  }

  test("handcrafted markup: blocks, breaks, entities, head/script/style") {
    val html = ("<html><head><title>T</title><style>p{color:red}</style></head>" +
      "<body><h1>Header</h1><script type=\"text/js\">var x = \"<p>\";</script>" +
      "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>" +
      "<div>line<br/>break</div><ul><li>item</li></ul></body></html>").getBytes("UTF-8")
    val got = Seq(Tuple1(html)).toDF("html")
      .select(HtmlText.htmlToText(col("html")).as("t")).head().getString(0)
    assert(got ===
      "Header\na & b <tag> \"q\" 's'\nline\nbreak\nitem")
  }

  test("double-encoded entities stay literal (&amp; decoded last)") {
    val got = Seq(Tuple1("<p>&amp;lt;not-a-tag&amp;gt;</p>".getBytes("UTF-8"))).toDF("html")
      .select(HtmlText.htmlToText(col("html")).as("t")).head().getString(0)
    assert(got === "&lt;not-a-tag&gt;")
  }

  test("pipeline parity: --from-html pages yield identical sentences") {
    val pages = PagesGen.pages(spark, 200L, 42L)
    val direct = KgPipeline.sentences(pages).collect().toSet
    val viaHtml = KgPipeline.sentences(HtmlText.pagesFromHtml(pages)).collect().toSet
    assert(viaHtml === direct)
  }
}
