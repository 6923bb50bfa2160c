package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

/** Property-based gates for the custom operator and the native kernels:
  * fixed samples can miss edge shapes; random inputs can't be argued with.
  * Sizes are kept small (each property case runs Spark jobs). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val params = org.scalacheck.Test.Parameters.default
    .withMinSuccessfulTests(12)
    .withWorkers(1)

  private def check(prop: Prop, p: org.scalacheck.Test.Parameters = params): Unit = {
    val res = org.scalacheck.Test.check(p, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: TopK.perKey == window row_number on random datasets") {
    val rowGen = for {
      key <- Gen.choose(0L, 6L)
      v <- Gen.choose(-100, 100)
      tie <- Gen.choose(0L, 3L) // duplicate order values force tie-breaking
    } yield (key, v.toDouble, tie)
    val dataGen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, rowGen)
      k <- Gen.choose(1, 5)
      parts <- Gen.choose(1, 5)
    } yield (rows, k, parts)

    val prop: Prop = forAll(dataGen) { case (rows, k, parts) =>
      val df = rows.toDF("key", "v", "tie").repartition(parts)
      val viaTopK = TopK.perKey(df, Seq(col("key")),
          Seq(desc("v"), asc("tie"), asc("key")), k)
        .select("key", "v", "tie", "rn").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      val w = Window.partitionBy($"key").orderBy(desc("v"), asc("tie"), asc("key"))
      val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select("key", "v", "tie", "rn").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      viaTopK == viaWindow
    }
    check(prop)
  }

  test("property: text-hash kernels == HOF formulations on random strings") {
    // strings over a nasty alphabet: multi-space runs, tabs/newlines,
    // punctuation, unicode letters, digits
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('\t', '\n', '\r', '\f')),
      (1, Gen.oneOf('ü', 'ß', 'é', 'ç')),
      (1, Gen.oneOf('.', ',', '\'', '-')))
    val textGen = for {
      n <- Gen.choose(0, 80)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString

    // RE2-equivalent whitespace class — the same one the kernels use (NOT
    // Java \s, which adds U+000B); the HOF reference must match the kernels'
    // documented tokenization
    val ws = "[ \\t\\n\\f\\r]+"
    def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(lower(trim(text)), ws)
      val k = size(toks) - (n - 1)
      when(k <= 0, array_distinct(array(concat_ws(" ", toks))))
        .otherwise(array_distinct(transform(sequence(lit(1), k),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
    }
    def hofSig(text: org.apache.spark.sql.Column, k: Int, n: Int) = {
      val hs = transform(hofShingles(text, n), s => xxhash64(s))
      aggregate(hs, array_repeat(lit(Long.MaxValue), k),
        (acc, h) => zip_with(acc,
          transform(sequence(lit(0), lit(k - 1)), i => xxhash64(h, i)),
          (a, b) => least(a, b)))
    }

    val prop: Prop = forAll(Gen.listOfN(12, textGen)) { texts =>
      val df = texts.toDF("text")
      val bad = df.select(
          graft.ops.Dedup.shingles($"text", 3).as("ks"),
          hofShingles($"text", 3).as("hs"),
          graft.ops.Dedup.minhashSignature($"text", 16, 3).as("km"),
          hofSig($"text", 16, 3).as("hm"))
        .filter($"ks" =!= $"hs" || $"km" =!= $"hm").count()
      bad == 0L
    }
    check(prop)
  }

  test("property: langid kernel score bounds and argmax consistency") {
    val textGen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency((9, Gen.alphaLowerChar), (2, Gen.const(' '))))
    } yield cs.mkString
    val prop: Prop = forAll(Gen.listOfN(10, textGen)) { texts =>
      val rows = texts.toDF("text").select(
          graft.ops.LangId.detect($"text").as("lang"),
          graft.ops.LangId.langScores($"text").as("ls"),
          graft.ops.LangId.score($"text", "en").as("en")).collect()
      rows.forall { r =>
        val lang = r.getString(0)
        val ls = r.getStruct(1)
        val n = ls.getInt(2)
        val scores = ls.getSeq[Double](1)
        val en = r.getDouble(2)
        val langOk =
          if (n == 0) lang == ""
          else {
            // reported language carries a maximal score
            val best = scores.max
            graft.ops.LangId.langsSorted.zip(scores).exists {
              case (l, s) => l == lang && s == best
            }
          }
        langOk && en >= 0.0 && en <= 1.0
      }
    }
    check(prop)
  }
}
