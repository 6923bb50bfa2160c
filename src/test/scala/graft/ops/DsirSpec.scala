package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the DSIR importance scorer: agreement with a driver-side
  * brute-force reference of the SAME bucketing/smoothing/fixed-point
  * arithmetic, direction sanity (target-like docs outscore off-target
  * ones), deterministic tie-broken selection, and partitioning
  * independence of the Long score sums. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def md5b(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, 4)
  }

  private def gramsOf(text: String): Seq[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (text.trim.isEmpty) Nil
    else (t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))).map(md5b)
  }

  /** Driver-side reference: identical buckets, smoothing, floor fixed-point. */
  private def reference(raw: Seq[(Long, String)], target: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    val rb = raw.flatMap { case (id, tx) => gramsOf(tx).map(id -> _) }
    val tb = target.flatMap { case (_, tx) => gramsOf(tx) }
    val cq = rb.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val cp = tb.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val nq = rb.length.toDouble; val np = tb.length.toDouble
    val w = cq.map { case (b, c) =>
      b -> math.floor(Dsir.LogScale.toDouble * math.log(
        ((cp.getOrElse(b, 0L) + 1.0) * (nq + Dsir.B)) /
          ((c + 1.0) * (np + Dsir.B)))).toLong
    }
    rb.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.map(x => w(x._2)).sum, xs.length.toLong))
    }
  }

  // deterministic corpus: "target-ish" docs share the science vocabulary,
  // raw mixes science-leaning and noise-leaning docs
  private val sci = Seq("quantum", "field", "theory", "boson", "lattice", "gauge")
  private val web = Seq("click", "buy", "cheap", "deal", "login", "shop")
  private def doc(words: Seq[String], seed: Int, n: Int): String =
    (0 until n).map(i => words(((seed * 31 + i * 7) & 0x7fffffff) % words.length)).mkString(" ")

  private val target = (0L until 8L).map(i => i -> doc(sci, i.toInt, 12))
  private val raw = (100L until 120L).map { i =>
    val w = if (i % 2 == 0) sci else web
    i -> doc(w, i.toInt, 12)
  }

  private lazy val scored = Dsir.score(raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"))
    .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("distributed scores equal the driver-side reference exactly") {
    assert(scored === reference(raw, target))
  }

  test("direction: every science-leaning raw doc outscores every web-leaning one") {
    val (sciDocs, webDocs) = raw.map(_._1).partition(_ % 2 == 0)
    assert(sciDocs.map(scored(_)._1).min > webDocs.map(scored(_)._1).max)
  }

  test("select keeps the top-m by (score desc, doc_id asc), deterministically") {
    val got = Dsir.select(raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"), m = 5)
      .as[(Long, Long, Long)].collect().map(_._1).toSeq
    val want = scored.toSeq.sortBy { case (id, (s, _)) => (-s, id) }.take(5).map(_._1)
    assert(got.sorted === want.sorted)
  }

  test("scores are partitioning-independent (exact Long sums)") {
    val r1 = Dsir.score(raw.toDF("doc_id", "text").repartition(1),
      target.toDF("doc_id", "text").repartition(1))
      .as[(Long, Long, Long)].collect().toSet
    val r7 = Dsir.score(raw.toDF("doc_id", "text").repartition(7, col("doc_id")),
      target.toDF("doc_id", "text").repartition(3))
      .as[(Long, Long, Long)].collect().toSet
    assert(r1 === r7)
  }

  test("empty and whitespace-only docs are never scored or selected") {
    val r = raw.toDF("doc_id", "text")
      .union(Seq((900L, ""), (901L, "   ")).toDF("doc_id", "text"))
    val ids = Dsir.score(r, target.toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900L) && !ids.contains(901L))
  }
}
