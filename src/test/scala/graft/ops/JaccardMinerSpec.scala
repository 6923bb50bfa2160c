package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The jaccard miner must reproduce the brute-force
  * capped-posting semantics EXACTLY (the oracle's formulation): inter =
  * |shared shingles with 2 ≤ df ≤ maxDf|, denominators = full distinct-set
  * sizes, every pair with jaccard ≥ t present. Randomized corpora stress
  * the prefix lemma across set sizes, duplicate families and caps. */
class JaccardMinerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Brute-force reference mirroring the DuckDB oracle CTEs. */
  private def reference(docs: Seq[(Long, String)], t: Double,
                        maxDf: Int): Set[(Long, Long, Double)] = {
    def shingles(s: String): Set[String] = {
      val toks = s.trim.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
      if (toks.length <= 2) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, s) => id -> shingles(s) }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val ids = docs.map(_._1)
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = math.min(ids(i), ids(j)); b = math.max(ids(i), ids(j))
      inter = (sets(a) intersect sets(b)).count(s => df(s) >= 2 && df(s) <= maxDf)
      if inter > 0
      jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if jac >= t
    } yield (a, b,
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  private def engine(docs: Seq[(Long, String)], t: Double,
                     maxDf: Int): Set[(Long, Long, Double)] =
    Dedup.jaccardPairs(docs.toDF("doc_id", "text"), threshold = t, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("randomized corpora: prefix-filtered miner ≡ brute force") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "la", "mu")
    for (trial <- 0 until 5) {
      val base = (0 until 40).map { i =>
        i.toLong -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // planted near-dups: one appended token (the docsWithDups construction)
      val dups = base.filter(_._1 % 3 == 0).map { case (id, s) => (id + 1000L, s + " extra") }
      val docs = base ++ dups
      for (t <- Seq(0.5, 0.8); maxDf <- Seq(8, 1000)) {
        assert(engine(docs, t, maxDf) === reference(docs, t, maxDf),
          s"trial=$trial t=$t maxDf=$maxDf")
      }
    }
  }

  test("short docs (≤2 tokens) and exact duplicates") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "a", 4L -> "x y z w q r",
      5L -> "x y z w q r", 6L -> "")
    assert(engine(docs, 0.8, 1000) === reference(docs, 0.8, 1000))
  }
}
