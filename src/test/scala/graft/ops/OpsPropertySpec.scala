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

  test("property: contamination report == brute-force n-gram overlap on random corpora") {
    val n = 3 // small n so short random docs actually produce grams
    val wordGen = Gen.oneOf((0 until 8).map(i => s"w$i"))
    val docGen = for {
      k <- Gen.choose(0, 10)
      ws <- Gen.listOfN(k, wordGen)
    } yield ws.mkString(" ")
    val gen = for {
      nDocs <- Gen.choose(2, 18)
      docs <- Gen.listOfN(nDocs, docGen)
      nBench <- Gen.choose(1, math.max(1, nDocs / 3))
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, nBench)

    val prop: Prop = forAll(gen) { case (docs, nBench) =>
      val df = docs.toDF("doc_id", "text")
      val bench = df.filter($"doc_id" < nBench)
      val got = Contamination.report(df, bench, n = n).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap

      def grams(t: String): Set[String] = {
        val ws = t.trim.toLowerCase.split("[ \\t\\n\\f\\r]+").filter(_ => t.trim.nonEmpty)
        if (ws.length < n) Set.empty else ws.sliding(n).map(_.mkString(" ")).toSet
      }
      val benchGrams = docs.filter(_._1 < nBench).flatMap(d => grams(d._2)).toSet
      docs.filter(_._1 >= nBench).forall { case (id, t) =>
        val g = grams(t)
        val shared = g.intersect(benchGrams).size.toLong
        got(id) == ((shared, g.size.toLong, shared > 0))
      } && got.size == docs.count(_._1 >= nBench)
    }
    check(prop)
  }

  test("property: groupQuantiles == sorted rank selection on random groups") {
    val gen = for {
      nRows <- Gen.choose(1, 60)
      rows <- Gen.listOfN(nRows, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(0L, 40L)
      } yield (g, v))
    } yield rows
    val prop: Prop = forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("doc_id", "grp", "v")
      val got = Stats.groupQuantiles(df, "grp", "v", qs = Seq(0.5, 0.9, 0.99)).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      rows.groupBy(_._1).forall { case (g, xs) =>
        val vs = xs.map(_._2).sorted
        def sel(q: Double) = vs(math.floor((vs.length - 1) * q).toInt)
        got(g) == ((vs.length.toLong, sel(0.5), sel(0.9), sel(0.99)))
      }
    }
    check(prop)
  }

  test("property: repetition kernel == HOF sorted-run-length reference on random text") {
    import org.apache.spark.sql.functions._
    // the HOF formulation the kernel replaced — kept here as the independent
    // parity reference (same move as PropertySpec's hofShingles)
    def hofRepetition(text: org.apache.spark.sql.Column) = {
      val ws = when(length(trim(text)) === 0, array().cast("array<string>"))
        .otherwise(split(lower(trim(text)), "[ \\t\\n\\f\\r]+"))
      def maxMult(sorted: org.apache.spark.sql.Column) =
        aggregate(sorted,
          struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
          (acc, x) => {
            val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
            struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best"))
      val n = size(ws)
      val bigrams = when(n < 2, array().cast("array<string>"))
        .otherwise(zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
          (a, b) => concat(a, lit(" "), b)))
      struct(n.as("n_words"),
        when(n === 0, 0).otherwise(maxMult(sort_array(ws))).as("top_word"),
        when(n < 2, 0).otherwise(maxMult(sort_array(bigrams))).as("top_bigram"),
        when(n === 0, 0).otherwise(size(array_distinct(ws))).as("n_distinct"))
    }
    val wordGen = Gen.oneOf((0 until 5).map(i => s"w$i") :+ "UPPER" :+ "mixedCase")
    val docGen = for {
      n <- Gen.choose(0, 15)
      ws <- Gen.listOfN(n, wordGen)
      pad <- Gen.oneOf("", "  ", "\t")
    } yield pad + ws.mkString(" ")
    val prop: Prop = forAll(Gen.listOfN(20, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = df.select($"doc_id",
        Quality.repetitionStats($"text").as("k"), hofRepetition($"text").as("h")).collect()
      rows.forall { r =>
        val k = r.getStruct(1); val h = r.getStruct(2)
        (0 until 4).forall(i => k.getInt(i) == h.getInt(i))
      }
    }
    check(prop)
  }
}
