package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for mirror detection: planted cross-host mirrors are found by
  * extracted-TEXT identity (mirror-injected markup differences must not
  * defeat the match), same-host duplicates are excluded, distinct content
  * never groups, and partitioning independence. */
class MirrorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def page(url: String, body: String): (String, Array[Byte]) =
    url -> s"<html><head><title>x</title></head><body>$body</body></html>".getBytes("UTF-8")

  private val pages = Seq(
    page("http://a.com/1", "<p>shared story</p>"),
    // mirror: same visible text, DIFFERENT markup (extra div + comment-free styling)
    "http://b.org/copy" -> "<html><head><script>t()</script></head><body><div><p>shared story</p></div></body></html>".getBytes("UTF-8"),
    page("http://a.com/2", "<p>unique a2</p>"),
    // same-host duplicate: must NOT be reported (that's url-canon's job)
    page("http://c.net/x", "<p>host-local dup</p>"),
    page("http://c.net/y", "<p>host-local dup</p>"))

  private def run(parts: Int = 3) =
    Mirrors.detect(pages.toDF("url", "html").repartition(parts))
      .select("n_urls", "n_hosts", "canonical_url")
      .as[(Long, Long, String)].collect().toSet

  test("cross-host mirrors group by extracted text despite markup noise") {
    assert(run() === Set((2L, 2L, "http://a.com/1")))
  }

  test("adding a third host to the mirror set raises n_hosts") {
    val more = pages :+ page("http://d.io/m", "<p>shared story</p>")
    val got = Mirrors.detect(more.toDF("url", "html"))
      .select("n_urls", "n_hosts").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 3L)))
  }

  test("results are identical across input partitioning") {
    assert(run(parts = 2) === run(parts = 11))
  }
}
