package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus curation: token counting,
  * quality scoring, language id, fingerprinting. All pure built-in column
  * expressions (codegen'd, no UDFs) — they run inside the parquet scan's
  * whole-stage-codegen span and scale embarrassingly. */
object TextStats {

  /** THE canonical corpus tokenization, shared by every text operator
    * (Bm25, LmScore, Contamination guards, stopwords) and mirrored by the
    * native kernels (`TextHash.tokens`) and every DuckDB oracle's
    * `regexp_split_to_array(lower(trim(text)), '\s+')`: lowercase, trim,
    * split on the explicit whitespace class. Change it HERE or nowhere —
    * a divergent copy silently breaks oracle parity. Empty/whitespace-only
    * text ⇒ empty array (split of "" would yield [""]). */
  def words(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "[ \\t\\n\\f\\r]+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "[ \\t\\n\\f\\r]+")))

  /** BPE-ish subword token count: runs of letters, runs of digits, single
    * other non-space chars — a cheap proxy for tokenizer-cost estimation.
    * Plain alternation regex (no lookarounds) so the DuckDB oracle's RE2
    * engine computes the identical count. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r]"), lit(0)))

  /** Punctuation ratio over non-space chars. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "[ \\t\\n\\f\\r]", ""))
    val punct = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", ""))
    when(nonSpace === 0, lit(0.0)).otherwise(punct.cast("double") / nonSpace.cast("double"))
  }

  /** English stopwords (top function words). */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "on", "is", "are", "was", "were", "it", "that", "this", "for", "with",
    "as", "at", "by", "be", "from")

  /** Fraction of tokens that are English stopwords — the language-id /
    * quality heuristic's core signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "[ \\t\\n\\f\\r]+")
    val sw = filter(toks, t => t.isin(EnStopwords: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(sw).cast("double") / size(toks).cast("double"))
  }

  /** Heuristic language id: stopword ratio + ASCII-letter ratio vote.
    * (A char-n-gram profile scorer lives in `LangProfiles` for the typed
    * path; this column version is the scan-time cheap filter.) */
  def isEnglishHeuristic(text: Column): Column =
    stopwordRatio(text) >= 0.08

  /** Composite quality score in [0,1]: length band + stopword presence +
    * low punctuation + mean word length band (C4/Gopher-style rules). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val meanWordLen = when(nTok === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[ \\t\\n\\f\\r]", "")).cast("double") / nTok.cast("double"))
    val lenScore = when(nTok.between(10, 5000), lit(0.4)).otherwise(lit(0.0))
    val swScore = when(stopwordRatio(text) >= 0.05, lit(0.3)).otherwise(lit(0.0))
    val punctScore = when(punctRatio(text) <= 0.2, lit(0.2)).otherwise(lit(0.0))
    val wordLenScore = when(meanWordLen.between(2.0, 12.0), lit(0.1)).otherwise(lit(0.0))
    round(lenScore + swScore + punctScore + wordLenScore, 2)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key. (md5 rather than xxhash64 so external systems —
    * and the DuckDB oracle — can reproduce it.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "[ \\t\\n\\f\\r]+", " "))

  /** Full stats projection over a docs table. */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // counts as long: the oracle's length()/len() are BIGINT, and the driver
    // hash is physical-type-sensitive — emit int64, never int32
    docs.select(col("doc_id"), length(t).cast("long").as("n_chars"),
      tokenCount(t).cast("long").as("n_tokens"),
      round(punctRatio(t), 4).as("punct_ratio"),
      round(stopwordRatio(t), 4).as("stopword_ratio"),
      qualityScore(t).as("quality"), fingerprint(t).as("fingerprint"))
  }
}
