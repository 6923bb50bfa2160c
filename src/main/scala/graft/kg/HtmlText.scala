package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** html → visible text extraction — the Common-Crawl-real FIRST stage of a
  * web-corpus pipeline (the input_hint's `html` column was previously
  * generated but never consumed; `text` was trusted). Pure codegen'd
  * regexp/replace chain — runs inside the scan's whole-stage-codegen span,
  * no UDF, and the identical formulation is expressible in DuckDB RE2 for
  * the cross-engine oracle (so: no backreferences, no lookarounds).
  *
  * Semantics (documented, deliberately minimal — a layout engine is out of
  * scope): drop head/script/style subtrees; close of a block-level element
  * (p, div, li, tr, h1-h6) and <br> become newlines; all remaining tags are
  * stripped; the five standard named entities (+ &#39;) are decoded, &amp;
  * LAST so double-encoded text stays literal; newline runs collapse and
  * leading/trailing newlines are trimmed. On the page generator's html this
  * reproduces the page `text` BYTE-IDENTICALLY (the north rule's per-url
  * invariant) — gated in HtmlTextSpec and by q56's matches_source column. */
object HtmlText {

  private val BlockDrop =
    "(?is)<head[^>]*>.*?</head>|<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
  private val BlockBreak = "(?i)</(?:p|div|li|tr|h[1-6])>|<br[ \\t]*/?>"
  private val AnyTag = "(?s)<[^>]*>"
  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** Visible text of an html column (binary or string; binary is decoded as
    * UTF-8). */
  def htmlToText(html: Column): Column = {
    val s = html.cast("string")
    val broken = regexp_replace(
      regexp_replace(s, BlockDrop, ""), BlockBreak, "\n")
    val stripped = regexp_replace(broken, AnyTag, "")
    val decoded = Entities.foldLeft(stripped) {
      case (c, (e, ch)) => replace(c, lit(e), lit(ch))
    }
    // \z (end of TEXT), not $: Java's $ also matches before a final line
    // terminator — \z pins the identical semantics in Java regex and RE2
    regexp_replace(regexp_replace(decoded, "\n{2,}", "\n"), "^\n+|\n+\\z", "")
  }

  /** The identical extraction as a DuckDB SQL expression over `col` (a BLOB
    * html column) — same regexes (RE2-compatible by construction), same
    * entity fold order. */
  def sqlExpr(col: String): String = {
    val broken =
      s"regexp_replace(regexp_replace(decode($col), '$BlockDrop', '', 'g'), '$BlockBreak', chr(10), 'g')"
    val stripped = s"regexp_replace($broken, '$AnyTag', '', 'g')"
    val decoded = Entities.foldLeft(stripped) { case (c, (e, ch)) =>
      val chSql = if (ch == "'") "''" else ch
      s"replace($c, '$e', '$chSql')"
    }
    // '\n' in a plain SQL literal reaches RE2 as the two-char escape, which
    // RE2 reads as newline; chr(10) in the REPLACEMENT is a real newline
    s"regexp_replace(regexp_replace($decoded, '\\n{2,}', chr(10), 'g'), '^\\n+|\\n+\\z', '', 'g')"
  }

  /** DuckDB oracle for q56 over the pinned pages table. */
  def oracleSql(pagesPin: String): String =
    s"""WITH f AS (SELECT url, text, ${sqlExpr("html")} AS extracted FROM '$pagesPin')
       SELECT url, md5(extracted) AS extracted_fp,
              (extracted = text) AS matches_source
       FROM f"""

  /** Pipeline mode: derive `text` from `html` instead of trusting the input
    * column (the real Common-Crawl shape, where text is OUR extraction). */
  def pagesFromHtml(pages: org.apache.spark.sql.Dataset[Page]): org.apache.spark.sql.Dataset[Page] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.toDF()
      .withColumn("text", htmlToText(org.apache.spark.sql.functions.col("html")))
      .as[Page]
  }
}
