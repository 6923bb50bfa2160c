package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Correctness gates for the round-3 curation operators: repetition quality
  * (Gopher rules), benchmark contamination, deterministic stratified
  * sampling, BM25 search. Each is checked against a hand-computed or
  * brute-force driver-side reference. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---------------------------------------------------------------- Quality

  test("repetition signals match hand-computed values") {
    val docs = Seq(
      (1L, "a a a a b"),             // top word a:4/5, bigram "a a":3/4, distinct 2/5
      (2L, "x y z w v u t"),         // all distinct (7 words: bigram ratio 1/6 clears 0.18)
      (3L, "spam spam spam spam"),   // fully repeated
      (4L, "solo"),                  // one word, no bigrams
      (5L, "")                       // empty
    ).toDF("doc_id", "text")
    val r = Quality.repetition(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("top_word_ratio") === 0.8)
    assert(r(1L).getAs[Double]("top_bigram_ratio") === 0.75)
    assert(r(1L).getAs[Double]("distinct_ratio") === 0.4)
    assert(!r(1L).getAs[Boolean]("passes"))
    assert(r(2L).getAs[Double]("top_word_ratio") === 0.1429)
    assert(r(2L).getAs[Double]("distinct_ratio") === 1.0)
    assert(r(2L).getAs[Boolean]("passes"))
    assert(r(3L).getAs[Double]("top_word_ratio") === 1.0)
    assert(r(3L).getAs[Double]("top_bigram_ratio") === 1.0)
    assert(!r(3L).getAs[Boolean]("passes"))
    assert(r(4L).getAs[Double]("top_word_ratio") === 1.0)
    assert(r(4L).getAs[Double]("top_bigram_ratio") === 0.0)
    assert(r(5L).getAs[Long]("n_words") === 0L)
    assert(r(5L).getAs[Double]("distinct_ratio") === 1.0)
  }

  test("repetition max-multiplicity agrees with explode+groupBy brute force") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hof = Quality.repetition(docs)
      .select($"doc_id", $"top_word_ratio").as[(Long, Double)].collect().toMap
    val brute = docs
      .select($"doc_id", explode(split(lower(trim($"text")), "[ \\t\\n\\f\\r]+")).as("w"))
      .groupBy($"doc_id", $"w").count()
      .groupBy($"doc_id").agg((max($"count") / sum($"count")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(hof.keySet === brute.keySet)
    for ((id, r) <- brute) assert(math.abs(hof(id) - r) < 5e-5, s"doc $id")
  }

  // ---------------------------------------------------- Contamination

  test("contamination flags planted benchmark copies and partial overlap") {
    val bench = Seq((100L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),   // the benchmark doc itself: excluded
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),     // exact copy: 3/3 grams shared
      (2L, "x t1 t2 t3 t4 t5 t6 t7 t8 y"),        // one shared 8-gram of 3
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),         // clean
      (4L, "short doc")                           // too short for any 8-gram
    ).toDF("doc_id", "text")
    val r = Contamination.report(corpus, bench, n = 8)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(100L))
    assert(r(1L).getAs[Long]("n_shared") === 3L && r(1L).getAs[Boolean]("contaminated"))
    assert(r(1L).getAs[Double]("contaminated_ratio") === 1.0)
    assert(r(2L).getAs[Long]("n_shared") === 1L && r(2L).getAs[Long]("n_grams") === 3L)
    assert(r(3L).getAs[Long]("n_shared") === 0L && !r(3L).getAs[Boolean]("contaminated"))
    assert(r(4L).getAs[Long]("n_grams") === 0L && !r(4L).getAs[Boolean]("contaminated"))
  }

  // -------------------------------------------------------- Sampling

  test("rateToHex thresholds: exact powers, clamp, keep-all sentinel") {
    assert(Sampling.rateToHex(0.5) === "8000")
    assert(Sampling.rateToHex(0.25) === "4000")
    assert(Sampling.rateToHex(0.0) === "0000")
    assert(Sampling.rateToHex(-1.0) === "0000")
    assert(Sampling.rateToHex(1.0) === "g") // > every 4-hex bucket ⇒ keep all
    assert(Sampling.rateToHex(2.0) === "g")
  }

  test("stratified sample is deterministic, respects strata, rate within tolerance") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "lang", "text")
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val a = Sampling.stratifiedSample(docs, "lang", rates, defaultRate = 0.0)
    val b = Sampling.stratifiedSample(docs.repartition(7), "lang", rates, defaultRate = 0.0)
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq ===
      b.select("doc_id").as[Long].collect().sorted.toSeq) // partitioning-independent
    val perLang = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!perLang.contains("de") && !perLang.contains("fr")) // defaultRate 0 drops
    // md5 buckets ≈ uniform: observed rate within ±0.15 of target on ~200 docs
    assert(math.abs(perLang("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(math.abs(perLang.getOrElse("zh", 0L).toDouble / totals("zh") - 0.25) < 0.15)
    // keep-all keeps every row
    val all = Sampling.stratifiedSample(docs, "lang", Map.empty[String, Double], defaultRate = 1.0)
    assert(all.count() === docs.count())
  }

  private def md5bucket(docId: Long, text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId:$text".getBytes("UTF-8"))
    d.take(2).map(b => f"${b & 0xff}%02x").mkString
  }
  private def hexThreshold(t: Long): String = if (t >= 65536) "g" else f"$t%04x"

  test("temperature sample keeps the smallest language whole and matches an exact recompute") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "lang", "text")
    val a = Sampling.temperatureSample(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val b = Sampling.temperatureSample(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq) // partitioning-independent

    // exact driver-side recompute: thresholds, then the md5 keep predicate
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nMin = counts.values.min
    val thr = counts.map { case (l, n) =>
      l -> math.floor(65536.0 * math.sqrt(nMin.toDouble / n.toDouble)).toLong }
    val expected = rows.filter { case (id, l, txt) =>
      md5bucket(id, txt) < hexThreshold(thr(l)) }
      .map { case (id, l, _) => (id, l, thr(l)) }.sortBy(_._1)
    assert(a.toSeq === expected.toSeq)
    // the rarest language (threshold 65536) is kept in full
    val minLang = counts.minBy(_._2)._1
    assert(thr(minLang) === 65536L)
    assert(a.count(_._2 == minLang).toLong === counts(minLang))
    // every other language is genuinely down-sampled
    assert(counts.keys.filter(_ != minLang).forall(l => thr(l) < 65536L))
  }

  test("mixBudget drops unbudgeted sources and matches an exact recompute") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "source", "text")
    val budgets = Map("src0" -> 700L, "src2" -> 5000L, "src19" -> 50L)
    val got = Sampling.mixBudget(docs, budgets).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val again = Sampling.mixBudget(docs.repartition(13), budgets).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq === again.toSeq) // partitioning-independent

    val ws = "[ \\t\\n\\f\\r]+" // the TextStats.tokenCount split set
    def nTok(t: String): Long = { val s = t.trim; if (s.isEmpty) 0L else s.split(ws).length.toLong }
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val totals = rows.groupBy(_._2).view.mapValues(_.map(x => nTok(x._3)).sum).toMap
    val thr = budgets.map { case (s, b) =>
      s -> math.floor(65536.0 * math.min(1.0, b.toDouble / totals(s).toDouble)).toLong }
    val expected = rows.filter { case (_, s, _) => budgets.contains(s) }
      .filter { case (id, s, txt) => md5bucket(id, txt) < hexThreshold(thr(s)) }
      .map { case (id, s, txt) => (id, s, nTok(txt), thr(s)) }.sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
    assert(got.forall(r => budgets.contains(r._2))) // unbudgeted sources gone
    assert(thr("src2") === 65536L) // over-budget source keeps everything
    assert(got.count(_._2 == "src2").toLong === rows.count(_._2 == "src2"))
  }

  // ------------------------------------------------------- Stats / ingest

  test("group quantiles equal driver-side sorted rank selection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Stats.groupQuantiles(docs, "lang", "n_chars").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = docs.select($"lang", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    for ((lang, vs) <- raw) {
      def sel(q: Double) = vs(math.floor((vs.length - 1) * q).toInt)
      assert(got(lang) === ((vs.length.toLong, sel(0.5), sel(0.9), sel(0.99))), s"lang $lang")
    }
  }

  test("incremental dedup: corpus hits dropped, batch-internal dups keep first") {
    val batch = Seq(
      (10L, "seen before"),   // already in corpus -> dropped
      (11L, "brand new one"), // novel
      (12L, "brand new one"), // batch-internal dup of 11 -> dropped
      (13L, "another new")    // novel
    ).toDF("doc_id", "text")
    val existing = Seq(Tuple1("seen before")).toDF("text")
      .select(TextStats.fingerprint($"text").as("fingerprint"))
    val kept = Dedup.incrementalDedup(batch, existing)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(11L, 13L))
  }

  test("HLL sketch distinct: within rsd error bound and parallelism-deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def run(parts: Int) = docs.repartition(parts).groupBy($"lang")
      .agg(approx_count_distinct(TextStats.fingerprint($"text"), 0.02).as("ad"),
        count_distinct(TextStats.fingerprint($"text")).as("ed"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = run(1)
    assert(a === run(7), "HLL merges must be order/parallelism-independent")
    for ((lang, (ad, ed)) <- a)
      assert(math.abs(ad - ed).toDouble / ed <= 3 * 0.02, s"$lang: approx $ad vs exact $ed")
  }

  // ------------------------------------------------------------ BM25

  test("bm25 matches a driver-side reference implementation") {
    val docs = Seq(
      (1L, "spark table spark join"),
      (2L, "table scan fast"),
      (3L, "spark spark spark spark spark spark"),
      (4L, "unrelated words entirely"),
      (5L, "")
    ).toDF("doc_id", "text")
    val queries = Seq(7L -> Seq("spark", "table"))
    val got = Bm25.search(docs, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // reference: plain double BM25 over the same corpus
    val corpus = Map(1L -> "spark table spark join", 2L -> "table scan fast",
      3L -> "spark spark spark spark spark spark", 4L -> "unrelated words entirely", 5L -> "")
    val toks = corpus.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array.empty[String] else t.trim.toLowerCase.split("\\s+"))
    }
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.length).sum / n
    def df(term: String) = toks.values.count(_.contains(term)).toDouble
    def score(id: Long, terms: Seq[String]) = terms.sorted.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * toks(id).length / avgdl))
    }.sum
    val expect = corpus.keys.map(id => id -> score(id, Seq("spark", "table")))
      .filter(_._2 > 0).toSeq.sortBy { case (id, s) => (-s, id) }.take(3)
      .zipWithIndex.map { case ((id, s), i) => (7L, (i + 1).toLong, id,
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.sortBy(_._2).toSeq === expect)
  }

  // ------------------------------------------------------------ LM score

  test("lm score: in-distribution text outranks gibberish; short docs get 0") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the"), // same unigrams, unseen bigrams
      (5L, "zz qq xx yy ww vv"),      // fully OOV
      (6L, "solo"),
      (7L, "")
    ).toDF("doc_id", "text")
    val r = LmScore.meanLogProb(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size === 7)
    val fluent = r(1L).getAs[Double]("avg_logp")
    assert(fluent === r(2L).getAs[Double]("avg_logp")) // identical docs, identical score
    assert(fluent > r(4L).getAs[Double]("avg_logp"), "reordered bigrams must score lower")
    assert(fluent > r(5L).getAs[Double]("avg_logp"), "OOV text must score below fluent")
    assert(r(6L).getAs[Long]("n_bigrams") === 0L && r(6L).getAs[Double]("avg_logp") === 0.0)
    assert(r(7L).getAs[Long]("n_bigrams") === 0L)
  }

  test("lm score equals a driver-side reference with the same fixed-point rule") {
    val texts = Map(1L -> "a b a b a c", 2L -> "c a b a", 3L -> "b b b", 4L -> "q z q")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val got = LmScore.meanLogProb(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap

    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val allW = toks.values.flatten.toSeq
    val uni = allW.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val v = uni.size.toLong
    val bigs = toks.values.flatMap(ws => ws.zip(ws.tail)).toSeq
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    for ((id, ws) <- toks) {
      val pairs = ws.zip(ws.tail)
      val fps = pairs.map { case (w1, w2) =>
        math.floor(math.log((bigs.getOrElse((w1, w2), 0L) + 1).toDouble /
          (uni.getOrElse(w1, 0L) + v).toDouble) * 1e9).toLong
      }
      val want = BigDecimal(fps.sum.toDouble / (pairs.length * 1e9))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === ((pairs.length.toLong, want)), s"doc $id")
    }
  }

  test("lm score is bit-identical across partitionings (the fixed-point guarantee)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = LmScore.meanLogProb(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(7))
    assert(a === b, "Long fixed-point sums must make the score partitioning-independent")
  }

  test("bm25 rank 1 is the focused high-tf doc; zero-score docs never appear") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha alpha"),
      (3L, "beta gamma delta")
    ).toDF("doc_id", "text")
    val r = Bm25.search(docs, Seq(1L -> Seq("alpha")), k = 5).collect()
    assert(r.map(_.getLong(2)).toSet === Set(1L, 2L)) // doc 3 has no alpha
    assert(r.find(_.getLong(1) == 1L).get.getLong(2) === 2L)
  }
}
