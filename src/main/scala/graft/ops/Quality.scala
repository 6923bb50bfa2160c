package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for web-text filtering (the
  * Gopher/RefinedWeb rule family): fraction of tokens taken by the most
  * frequent word / bigram, and the distinct-token ratio. Heavily repeated
  * boilerplate (nav bars, SEO keyword stuffing, templated spam) scores high
  * on the top-n-gram fractions and low on the distinct ratio.
  *
  * Scale design: everything is a higher-order-function column expression
  * over the in-row token array — the mode of a multiset is found as the
  * longest run in the SORTED array via one `aggregate` pass, so the whole
  * signal set runs inside the parquet scan with ZERO shuffles and no UDF.
  * (The naive formulation — explode + groupBy(doc_id, word) + max — costs
  * two shuffles keyed by doc; at 10^12 docs that is the difference between
  * a scan-rate filter and a multi-hour job.)
  */
object Quality {

  private def words(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "[ \\t\\n\\f\\r]+"))

  /** Longest run of equal adjacent elements in a SORTED string array =
    * multiplicity of the most frequent element of the multiset. One linear
    * `aggregate` pass, struct accumulator (prev, run, best). */
  private def maxMultiplicity(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Adjacent-word bigrams of a token array (size n-1; empty below 2). */
  private def bigrams(ws: Column): Column = {
    val n = size(ws)
    when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** count(most frequent word) / count(words), 0.0 for empty docs. */
  def topWordRatio(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0))
      .otherwise(round(maxMultiplicity(sort_array(ws)).cast("double") /
        size(ws).cast("double"), 4))
  }

  /** count(most frequent bigram) / count(bigrams), 0.0 below 2 words. */
  def topBigramRatio(text: Column): Column = {
    val bs = bigrams(words(text))
    when(size(bs) === 0, lit(0.0))
      .otherwise(round(maxMultiplicity(sort_array(bs)).cast("double") /
        size(bs).cast("double"), 4))
  }

  /** distinct words / words, 1.0 convention for empty docs. */
  def distinctRatio(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(1.0))
      .otherwise(round(size(array_distinct(ws)).cast("double") /
        size(ws).cast("double"), 4))
  }

  /** Gopher-style repetition gate: true = doc looks natural, false = doc is
    * repetition-dominated boilerplate/spam. */
  def passesRepetitionFilter(text: Column,
                             maxTopWord: Double = 0.20,
                             maxTopBigram: Double = 0.18,
                             minDistinct: Double = 0.30): Column =
    (topWordRatio(text) <= maxTopWord) &&
      (topBigramRatio(text) <= maxTopBigram) &&
      (distinctRatio(text) >= minDistinct)

  /** Per-doc repetition report over a docs table. */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col("doc_id"),
      size(words(t)).cast("long").as("n_words"),
      topWordRatio(t).as("top_word_ratio"),
      topBigramRatio(t).as("top_bigram_ratio"),
      distinctRatio(t).as("distinct_ratio"),
      passesRepetitionFilter(t).as("passes"))
  }
}
