package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for web-text filtering (the
  * Gopher/RefinedWeb rule family): fraction of tokens taken by the most
  * frequent word / bigram, and the distinct-token ratio. Heavily repeated
  * boilerplate (nav bars, SEO keyword stuffing, templated spam) scores high
  * on the top-n-gram fractions and low on the distinct ratio.
  *
  * Scale design: all four signals come from ONE native-kernel pass per row
  * ([[graft.plans.RepetitionStatsExpression]], codegen'd) inside the
  * parquet scan — ZERO shuffles, no UDF, no explode. (The naive
  * formulation — explode + groupBy(doc_id, word) + max — costs two
  * shuffles keyed by doc; at 10^12 docs that is the difference between a
  * scan-rate filter and a multi-hour job. The intermediate HOF formulation
  * — sort_array + `aggregate` run-length — was shuffle-free but evaluated
  * interpreted lambdas per token; it survives as the parity reference in
  * OpsPropertySpec.)
  */
object Quality {

  /** One-pass native kernel: struct<n_words, top_word, top_bigram,
    * n_distinct> (see [[graft.plans.TextHash.repetitionStats]]). The
    * previous HOF formulation (sort_array + `aggregate` run-length, kept in
    * OpsPropertySpec as the parity reference) evaluated interpreted lambdas
    * over every token and bigram per row. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.RepetitionStatsExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** count(most frequent word) / count(words), 0.0 for empty docs. */
  def topWordRatio(text: Column): Column = {
    val s = repetitionStats(text)
    when(s.getField("n_words") === 0, lit(0.0))
      .otherwise(round(s.getField("top_word").cast("double") /
        s.getField("n_words").cast("double"), 4))
  }

  /** count(most frequent bigram) / count(bigrams), 0.0 below 2 words. */
  def topBigramRatio(text: Column): Column = {
    val s = repetitionStats(text)
    when(s.getField("n_words") < 2, lit(0.0))
      .otherwise(round(s.getField("top_bigram").cast("double") /
        (s.getField("n_words") - 1).cast("double"), 4))
  }

  /** distinct words / words, 1.0 convention for empty docs. */
  def distinctRatio(text: Column): Column = {
    val s = repetitionStats(text)
    when(s.getField("n_words") === 0, lit(1.0))
      .otherwise(round(s.getField("n_distinct").cast("double") /
        s.getField("n_words").cast("double"), 4))
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
      repetitionStats(t).getField("n_words").cast("long").as("n_words"),
      topWordRatio(t).as("top_word_ratio"),
      topBigramRatio(t).as("top_bigram_ratio"),
      distinctRatio(t).as("distinct_ratio"),
      passesRepetitionFilter(t).as("passes"))
  }
}
