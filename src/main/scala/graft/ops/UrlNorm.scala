package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the step every web-corpus
  * pipeline runs BEFORE content dedup: the same page is crawled under
  * scheme-case/host-case variants, `www.` aliases, default-port spellings,
  * tracking query parameters (utm_*, fbclid, gclid), `/index.html` suffixes,
  * trailing slashes and fragments. Canonicalizing first collapses those
  * families for free (string ops at scan rate) so the expensive
  * content-dedup passes (MinHash/SimHash/SemDeDup) see each page once.
  *
  * Everything is a pure codegen'd regexp/replace chain — no UDF, runs inside
  * the parquet scan's whole-stage-codegen span at any corpus size — and
  * every regex is RE2-compatible BY CONSTRUCTION (no backreferences in
  * patterns or replacements, no lookarounds, `\z` not `$`), so the identical
  * chain is emitted as DuckDB SQL for the cross-engine oracle
  * ([[HtmlText]]'s discipline).
  *
  * Normal form (documented, deliberately conservative): lowercase scheme and
  * authority; strip `www.`; strip the scheme's default port (443/80); path
  * and query case PRESERVED (paths are case-sensitive); fragment dropped;
  * tracking parameters dropped with their delimiters repaired; trailing
  * `/index.html` and trailing `/` dropped. Non-tracking parameter order is
  * preserved (sorting parameters can change semantics; we only delete).
  *
  * Scale design: [[normalize]] is shuffle-free. [[dedupByUrl]] adds exactly
  * ONE exchange keyed by the normalized url (the dedup key must co-locate —
  * same shape as exact content dedup, ops/Dedup.scala:25). The window state
  * per key is a counter + first-row flag, never a buffered group.
  */
object UrlNorm {

  /** Fragment, including the `#`. URLs are single-line so `.` suffices. */
  private val FragRe = "#.*"

  /** Tracking parameter names. */
  private val Track = "(?:utm_[a-z0-9_]*|fbclid|gclid)"

  /** A tracking param in non-first position — the `&` delimiter is its own
    * and is deleted with it. */
  private val TrackAmpRe = s"&$Track=[^&]*"

  /** A FIRST tracking param with more params following: deleting it must
    * hand the `?` to the next param — fixed-string replacement `?`, no
    * backreference needed. */
  private val TrackFirstMidRe = s"\\?$Track=[^&]*&"

  /** A first-and-only (remaining) tracking param: the `?` goes with it. */
  private val TrackFirstEndRe = s"\\?$Track=[^&]*\\z"

  /** scheme://authority (everything before the path/query). */
  private val SchemeHostRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Canonical form of a URL column (see object doc for the normal form). */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, FragRe, "")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, TrackAmpRe, ""),
        TrackFirstMidRe, "?"),
      TrackFirstEndRe, "")
    val sh = lower(regexp_extract(noTrack, SchemeHostRe, 0))
    // anchored at ^, so replace-first == replace-all
    val rest = regexp_replace(noTrack, SchemeHostRe, "")
    val noPort = when(sh.startsWith("https://"),
        regexp_replace(sh, ":443\\z", ""))
      .otherwise(regexp_replace(sh, ":80\\z", ""))
    val noWww = regexp_replace(noPort, "://www\\.", "://")
    val noIndex = regexp_replace(
      regexp_replace(rest, "/index\\.html\\?", "?"), "/index\\.html\\z", "")
    val noSlash = regexp_replace(
      regexp_replace(noIndex, "/\\?", "?"), "/\\z", "")
    concat(noWww, noSlash)
  }

  /** Host (lowercased authority, www/default-port already gone) of a
    * NORMALIZED url. */
  def host(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** URL-keyed dedup report: every doc with its canonical form, whether it
    * is the keeper (first doc_id) of its url family, and the family size. */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withNorm = docs.withColumn("url_norm", normalize(col(urlCol)))
    val w = Window.partitionBy(col("url_norm"))
    withNorm.select(col("doc_id"), col(urlCol).as("url"), col("url_norm"),
        host(col("url_norm")).as("host"),
        (row_number().over(w.orderBy(col("doc_id"))) === 1).as("canonical"),
        count(lit(1)).over(w).as("n_dups"))
  }

  /** The identical normalization as a DuckDB SQL expression over `col` —
    * same regexes (RE2-compatible by construction), same order. DuckDB's
    * regexp_replace is first-match-only by default, hence the explicit 'g'
    * (TrackAmpRe genuinely needs it; it is a no-op for the anchored ones). */
  def normalizeSqlExpr(col: String): String = {
    val noFrag = s"regexp_replace($col, '$FragRe', '', 'g')"
    val noTrack =
      s"""regexp_replace(regexp_replace(regexp_replace($noFrag,
            '$TrackAmpRe', '', 'g'),
            '$TrackFirstMidRe', '?', 'g'),
            '$TrackFirstEndRe', '', 'g')"""
    val sh = s"lower(regexp_extract($noTrack, '$SchemeHostRe', 0))"
    val rest = s"regexp_replace($noTrack, '$SchemeHostRe', '', 'g')"
    val noPort =
      s"""CASE WHEN $sh LIKE 'https://%'
               THEN regexp_replace($sh, ':443\\z', '', 'g')
               ELSE regexp_replace($sh, ':80\\z', '', 'g') END"""
    val noWww = s"regexp_replace($noPort, '://www\\.', '://', 'g')"
    val noIndex =
      s"""regexp_replace(regexp_replace($rest,
            '/index\\.html\\?', '?', 'g'), '/index\\.html\\z', '', 'g')"""
    val noSlash =
      s"""regexp_replace(regexp_replace($noIndex,
            '/\\?', '?', 'g'), '/\\z', '', 'g')"""
    s"($noWww || $noSlash)"
  }
}
