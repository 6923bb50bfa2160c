package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for web-text corpora: detect and redact email addresses
  * and phone-shaped numbers before training-data export. Pure codegen'd
  * column expressions (regexp_count / regexp_replace) — the scrub runs
  * inside the parquet scan's whole-stage-codegen at any corpus size, no
  * shuffle, no UDF.
  *
  * The patterns are deliberately RE2-compatible (no backrefs, no lookahead)
  * so the same semantics hold in DuckDB/RE2-based engines — the q34 oracle
  * runs them verbatim.
  */
object Scrub {

  /** Email-shaped spans (ASCII local@domain.tld). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"

  /** US-short phone-shaped numbers (555-0123 style). */
  val PhoneRe = "\\d{3}-\\d{4}"

  /** Redacted text: emails → [EMAIL] first, then phones → [PHONE] (order
    * matters — the email local part may itself contain digits). */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  /** Per-doc scrub report: match counts plus an md5 fingerprint of the
    * redacted text (the value-checkable proxy for the full output). */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(redact(col(textCol)).cast("binary")).as("clean_fp"))

  /** The composed corpus-clean step a training-data pipeline actually runs:
    * keep docs that (a) pass the language filter, (b) clear the quality
    * threshold, and (c) are the first (min doc_id) occurrence of their
    * normalized-text fingerprint — then redact PII from the survivors.
    * Everything up to the dedup is a codegen'd scan-side filter; the dedup
    * adds ONE shuffle keyed by the 16-byte fingerprint. Survivor rows carry
    * the scores so downstream sampling can stratify without recomputing. */
  def corpusClean(docs: DataFrame, minQuality: Double = 0.5,
                  textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filtered = docs
      .filter(TextStats.isEnglishHeuristic(col(textCol)))
      .filter(TextStats.qualityScore(col(textCol)) >= minQuality)
    val w = Window.partitionBy(TextStats.fingerprint(col(textCol)))
      .orderBy(col("doc_id"))
    filtered.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"),
        round(TextStats.qualityScore(col(textCol)), 2).as("quality"),
        TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        md5(redact(col(textCol)).cast("binary")).as("clean_fp"))
  }
}
