package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import graft.SparkTestBase

/** Property gates for the round-3 dedup operators: each is checked against
  * an independent brute-force Scala reference on random inputs at random
  * parallelism (the driver's DuckDB oracle checks one fixed dataset; these
  * check the semantics across shapes a fixture can miss). */
class OpsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val params = org.scalacheck.Test.Parameters.default
    .withMinSuccessfulTests(10)
    .withWorkers(1)

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: spanDedup == brute-force first-occurrence on random corpora") {
    val span = 3
    val wordGen = Gen.oneOf((0 until 6).map(i => s"w$i")) // tiny vocab → real collisions
    val docGen = for {
      n <- Gen.choose(1, 11)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(1, 25)
      docs <- Gen.listOfN(n, docGen)
      parts <- Gen.choose(1, 4)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, parts)

    val prop: Prop = forAll(corpusGen) { case (docs, parts) =>
      // brute force: global first-occurrence by (doc_id, span_idx) over span TEXT
      val spans = docs.flatMap { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+").toSeq
        val n = math.max(1, math.ceil(toks.size / span.toDouble).toInt)
        (0 until n).map(i => (id, i, toks.slice(i * span, i * span + span).mkString(" ")))
      }.sortBy(s => (s._1, s._2))
      val seen = scala.collection.mutable.Set[String]()
      val ref = spans.groupBy(_._1).view.mapValues(_.size).toMap // n_spans per doc
      val dupRef = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      spans.foreach { case (id, _, s) =>
        if (!seen.add(s)) dupRef(id) += 1
      }
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text").repartition(parts), span)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      docs.forall { case (id, _) =>
        got(id) == ((ref(id).toLong, dupRef(id)))
      }
    }
    check(prop)
  }

  test("property: dupClusters == brute-force union-find on random pair sets") {
    val idGen = Gen.oneOf(Gen.choose(0L, 20L), Gen.choose(999999990L, 1000000010L))
    val pairGen = for { a <- idGen; b <- idGen if a != b } yield (a, b)
    val caseGen = for {
      n <- Gen.choose(1, 30)
      ps <- Gen.listOfN(n, pairGen)
      parts <- Gen.choose(1, 4)
    } yield (ps, parts)

    val prop: Prop = forAll(caseGen) { case (pairs, parts) =>
      // brute-force union-find with numeric-min roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      pairs.foreach { case (a, b) => union(a, b) }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val ref = nodes.map(n => n -> find(n)).toMap

      val got = Dedup.dupClusters(pairs.toDF("doc_a", "doc_b").repartition(parts))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      nodes.forall { n =>
        got(n) == ((ref(n), n == ref(n)))
      }
    }
    check(prop)
  }
}
