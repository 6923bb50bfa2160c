package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Correctness tests for the scale operators: planted duplicates must be
  * found, LSH candidates must cover the exact result, ANN must agree with
  * brute force on recalled items. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 40 base docs from a 30-word vocab + 10 near-dup copies (one word changed)
  // + 5 exact copies
  lazy val docs = {
    val vocab = ('a' to 'z').map(c => s"w$c")
    val base = (0 until 40).map { i =>
      val words = (0 until 30).map(j => vocab((graft.kg.Synth.splitmix64(i * 100 + j) % 26 + 26).toInt % 26))
      (i.toLong, words.mkString(" "))
    }
    val nearDups = base.take(10).map { case (id, t) =>
      (id + 1000L, t.split(" ").updated(5, "CHANGED").mkString(" "))
    }
    val exactDups = base.take(5).map { case (id, t) => (id + 2000L, t) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup finds exactly the planted exact duplicates") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 5)
    assert(groups.forall(_.getAs[Long]("n_docs") == 2))
    val survivors = Dedup.exactDedup(docs)
    assert(survivors.count() === 50) // 55 - 5 exact copies
  }

  test("ngram jaccard finds planted near-dups (and exact dups at 1.0)") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5, maxDf = 1000).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 10) assert(pairSet.contains((i.toLong, i + 1000L)), s"near-dup $i missing")
    for (i <- 0 until 5) assert(pairSet.contains((i.toLong, i + 2000L)), s"exact-dup $i missing")
    // exact copies score 1.0 against their twin
    assert(pairs.filter(r => r.getLong(1) == r.getLong(0) + 2000L)
      .forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("dupClusters: chains collapse to one cluster keyed by the numeric min id") {
    // pairs forming a chain 3—1003—7 plus an isolated pair (12, 1012): CC
    // must merge the chain transitively and keep the NUMERIC minimum (1003
    // vs 7 orders differently as strings — the lpad guard under test)
    val pairs = Seq((3L, 1003L), (1003L, 7L), (12L, 1012L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (3L, 3L, true), (1003L, 3L, false), (7L, 3L, false),
      (12L, 12L, true), (1012L, 12L, false)))
  }

  test("dupClusters on the planted corpus: every near/exact dup pair lands in one cluster") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.5, maxDf = 1000)
    val clusters = Dedup.dupClusters(pairs).collect()
    val byDoc = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until 10) assert(byDoc(i.toLong) === byDoc(i + 1000L), s"near-dup $i split")
    for (i <- 0 until 5) assert(byDoc(i.toLong) === byDoc(i + 2000L), s"exact dup $i split")
    // exactly one kept doc per cluster, and it is the cluster minimum
    clusters.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      assert(rows.count(_.getBoolean(2)) === 1)
      assert(rows.map(_.getLong(0)).min === cid)
    }
  }

  test("spanDedup: repeated 10-token spans counted at every occurrence but the first") {
    val ten = (0 until 10).map(i => s"t$i").mkString(" ")
    val other = (0 until 10).map(i => s"u$i").mkString(" ")
    val rows = Seq(
      (1L, s"$ten $other"),   // both spans first occurrences
      (2L, s"$ten $ten"),     // two copies of an already-seen span
      (3L, other)             // one copy of an already-seen span
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 0L, 0.0)))
    assert(got(2L) === ((2L, 2L, 1.0)))
    assert(got(3L) === ((1L, 1L, 1.0)))
  }

  test("lineDedup: corpus-wide keep-first per line, reconstruction fingerprint") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Seq(
      (1L, "alpha beta\ncommon line\ngamma"),
      (2L, "common line\ndelta"),      // "common line" already seen in doc 1
      (3L, "common line\ncommon line") // every line a dup → empty rebuild
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got(1L) === ((3L, 0L, 0.0, md5hex("alpha beta\ncommon line\ngamma"))))
    assert(got(2L) === ((2L, 1L, 0.5, md5hex("delta"))))
    assert(got(3L) === ((2L, 2L, 1.0, md5hex(""))))
  }

  test("lineDedup: identical at any parallelism (keep-first tie-break is global)") {
    // many docs sharing lines; the winner of each line must not depend on
    // partitioning, and the rebuilt-text order must follow line_idx
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, (0 until 6).map(j => s"line ${(i + j) % 9} payload").mkString("\n"))
    }
    def run(parts: Int) = Dedup.lineDedup(docs.toDF("doc_id", "text").repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .sortBy(_._1)
    val one = run(1)
    assert(one.toSeq === run(7).toSeq)
    // 9 distinct lines corpus-wide → exactly 9 kept lines across all docs
    assert(one.map(t => t._2 - t._3).sum === 9)
  }

  test("PII scrub: counts and redaction, email digits not double-counted as phones") {
    val rows = Seq(
      (1L, "mail me at jane.doe@example.org or call 555-0199 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.net and 111-2222 333-4444")
    ).toDF("doc_id", "text")
    val got = graft.ops.Scrub.scrub(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 === 1L); assert(got(1L)._2 === 1L)
    assert(got(2L)._1 === 0L); assert(got(2L)._2 === 0L)
    assert(got(3L)._1 === 2L); assert(got(3L)._2 === 2L)
    // redaction is total: fingerprint of the expected redacted strings
    val expected = Seq(
      "mail me at [EMAIL] or call [PHONE] ok",
      "no pii here at all",
      "two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]")
    val exp = expected.map(s => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got(1L)._3 === exp(0)); assert(got(2L)._3 === exp(1)); assert(got(3L)._3 === exp(2))
  }

  test("corpusClean: lang filter + quality gate + keep-first dedup + redaction compose") {
    val good = "the cat sat on the mat and it was a good day for all of the cats " +
      "in this the finest of towns"   // english, decent quality
    val rows = Seq(
      (10L, good),
      (11L, good),                               // exact dup — dropped (10 kept)
      (12L, "zzz qqq xxx vvv kkk jjj mmm nnn ppp rrr ttt www yyy uuu"), // no stopwords → lang-filtered
      (13L, good + " mail me at a.b@c.org now please ok")  // survives, redacted
    ).toDF("doc_id", "text")
    val got = graft.ops.Scrub.corpusClean(rows).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got.keySet === Set(10L, 13L))
    val expect13 = java.security.MessageDigest.getInstance("MD5")
      .digest((good + " mail me at [EMAIL] now please ok").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(13L) === expect13)
  }

  test("minhash LSH candidates cover the exact jaccard result at 0.5") {
    val exact = Dedup.jaccardPairs(docs, threshold = 0.5, maxDf = 1000)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDupPairs(docs, threshold = 0.5, k = 32, bands = 16)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 bands × 2 rows ⇒ P(candidate | s=0.5) = 1-(1-0.25)^16 ≈ 0.99
    assert(exact.subsetOf(lsh), s"missing: ${exact -- lsh}")
  }

  test("simhash pairs include exact duplicates at distance 0") {
    val pairs = Dedup.simhashDupPairs(docs, maxDist = 3).collect()
    val d0 = pairs.filter(_.getAs[Long]("dist") == 0L).map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5) assert(d0.contains((i.toLong, i + 2000L)))
  }

  test("brute-force ANN: self-similar perturbed vector is rank 1") {
    val vecs = (0 until 100).map { i =>
      val v = (0 until 16).map(d => ((graft.kg.Synth.splitmix64(i * 31 + d) % 1000) / 500.0 - 1.0).toFloat).toArray
      (i.toLong, v)
    }
    val perturbed = vecs.take(3).map { case (id, v) =>
      (id + 500L, v.updated(0, v(0) + 0.001f))
    }
    val df = (vecs ++ perturbed).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" < 3), k = 1).collect()
    for (r <- top) assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") + 500L)
    assert(top.forall(_.getAs[Double]("cos") >= 0.9999))
  }

  test("textstats quality and fingerprint behave") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the hill"),
      (2L, "x"),
      (3L, "the   quick\tbrown fox jumps over the lazy dog and runs to the hill")).toDF("doc_id", "text")
    val s = TextStats.stats(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(s(1L).getAs[Double]("quality") >= 0.9)
    assert(s(2L).getAs[Double]("quality") <= 0.4)
    // fingerprint is whitespace-normalized: 1 and 3 collide
    assert(s(1L).getAs[String]("fingerprint") === s(3L).getAs[String]("fingerprint"))
  }

  test("multimodal decode stub: deterministic metadata, byte length matches payload") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(df, partitions = 2).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes === 11)
    assert(meta(2L).n_bytes === 0)
    val again = Multimodal.decodeMeta(df, partitions = 2).collect().map(m => m.doc_id -> m).toMap
    assert(meta === again)
  }

  test("token counts: whitespace and BPE-ish subword proxy") {
    val df = Seq(
      ("hello world", 2, 2),
      ("can't stop won't stop", 4, 8),         // can ' t stop won ' t stop
      ("abc123 x-9", 2, 5),                    // abc 123 x - 9
      ("", 0, 0),
      ("   spaced   out   ", 2, 2)).toDF("text", "ws", "bpeish")
    val rows = df.select(
      TextStats.tokenCount(col("text")).as("w"),
      TextStats.bpeishCount(col("text")).as("b"),
      col("ws"), col("bpeish")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(2), r.toString)
      assert(r.getInt(1) === r.getInt(3), r.toString)
    }
  }
}
