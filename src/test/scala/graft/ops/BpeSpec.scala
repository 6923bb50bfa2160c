package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Gates for the distributed BPE trainer/encoder: every piece is checked
  * against an in-test brute-force reference (the 20-line single-node BPE),
  * plus the engine invariants — greedy non-overlapping merge semantics and
  * partitioning determinism. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --- brute-force reference implementation (single-node BPE) ---
  private def refSyms(w: String): Vector[String] =
    w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")
  private def refFold(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out.toVector
  }
  private def refWordFreqs(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(t => if (t.trim.isEmpty) Nil else t.trim.toLowerCase.split("\\s+").toSeq)
      .filter(_.nonEmpty).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
  private def refPairCounts(vocab: Map[Vector[String], Long]): Map[String, Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map { case (a, b) => (a + " " + b) -> f }
    }.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
  private def refLearn(docs: Seq[String], n: Int): Seq[(String, String)] = {
    var vocab = refWordFreqs(docs).map { case (w, f) => refSyms(w) -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (!stop && merges.length < n) {
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) stop = true
      else {
        val (p, _) = pc.toSeq.minBy { case (pair, c) => (-c, pair) }
        val Array(a, b) = p.split(" ", 2)
        merges += ((a, b))
        vocab = vocab.toSeq.map { case (s, f) => refFold(s, a, b) -> f }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "the cat and the hat in the grand plan",
    "another random banana and an anthem",
    "thin theme then there and here",
    "aaa anan banana the the the")
  private def docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("pairStats matches the brute-force weighted pair counts") {
    val got = Bpe.pairStats(docs, topN = 1000).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val vocab = refWordFreqs(corpus).map { case (w, f) => refSyms(w) -> f }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val ref = refPairCounts(vocab).toSeq.sortBy { case (p, c) => (-c, p) }
    assert(got.toSeq === ref)
  }

  test("mergeOnce has greedy non-overlapping semantics") {
    val one = Seq(("aaa"), ("anan"), ("ana")).toDF("word")
    val m = one.select(col("word"),
      Bpe.applyMerges(Bpe.symbols(col("word")), Seq(("61", "61"))).as("s1"),
      Bpe.applyMerges(Bpe.symbols(col("word")), Seq(("61", "6E"))).as("s2"))
      .collect().map(r => r.getString(0) -> ((r.getSeq[String](1), r.getSeq[String](2)))).toMap
    // "aaa" + (a,a): greedy left-to-right → (aa)(a), never (a)(aa)
    assert(m("aaa")._1 === Seq("6161", "61"))
    // "anan" + (a,n): adjacent non-overlapping pairs BOTH merge
    assert(m("anan")._2 === Seq("616E", "616E"))
    // "ana" + (a,n): trailing symbol survives
    assert(m("ana")._2 === Seq("616E", "61"))
  }

  test("learnMerges equals the brute-force BPE trainer, merge by merge") {
    val got = Bpe.learnMerges(docs, nMerges = 8)
    val ref = refLearn(corpus, 8)
    assert(got === ref)
  }

  test("hybrid trainer: driver-side fast path equals the distributed path merge by merge") {
    // default bound → local fast path; maxFitWords = 0 forces distributed
    val local = Bpe.learnMerges(docs, nMerges = 8)
    val dist = Bpe.learnMerges(docs, nMerges = 8, maxFitWords = 0)
    assert(local === dist)
    assert(local === refLearn(corpus, 8))
  }

  test("fast path learns a 1000-merge vocabulary without per-merge Spark jobs") {
    // rich enough vocabulary to sustain 1000 merges (distinct numbers/topics/
    // entities each contribute their symbol-length-1 merge budget)
    val big = (0 until 600).map(i => (i.toLong,
      s"document number $i about topic${i % 37} token word$i with shared " +
        s"phrasing and entity${i % 53} appearing repeatedly")).toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = Bpe.learnMerges(big, nMerges = 1000)
      // listener events post asynchronously; all jobs finished before
      // learnMerges returned, so poll until the counter stabilizes
      var last = -1
      var spins = 0
      while (jobs.get() != last && spins < 30) {
        last = jobs.get(); Thread.sleep(100); spins += 1
      }
      assert(merges.length === 1000)
      // the whole train is ONE probing collect (a couple of jobs with AQE) —
      // the distributed path would schedule ≥ 1000
      assert(jobs.get() <= 6, s"expected a bounded-collect train, saw ${jobs.get()} jobs")
      // spot-parity with the distributed trainer on the first merges
      val dist = Bpe.learnMerges(big, nMerges = 25, maxFitWords = 0)
      assert(merges.take(25) === dist)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("learnMerges stops early when no pairs remain") {
    val tiny = Seq((0L, "a b a")).toDF("doc_id", "text")
    // only 1-byte words: zero pairs at iteration 0
    assert(Bpe.learnMerges(tiny, nMerges = 5) === Seq.empty)
  }

  test("encode matches brute force under learned merges and is partition-invariant") {
    val merges = refLearn(corpus, 6)
    val got = Bpe.encode(docs, merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val nb = ws.map(_.getBytes("UTF-8").length.toLong).sum
      val nt = ws.map(w => merges.foldLeft(refSyms(w)) {
        case (s, (a, b)) => refFold(s, a, b)
      }.length.toLong).sum
      (i.toLong, nb, nt)
    }
    assert(got.toSeq === ref)
    // merges can only shrink the token count, never below 1 per word
    got.zip(ref).foreach { case ((_, nb, nt), _) => assert(nt <= nb && nt >= 1) }
    val alt = Bpe.encode(docs.repartition(7), merges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(alt.toSeq === got.toSeq)
  }
}
