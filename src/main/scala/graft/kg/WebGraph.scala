package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph construction from raw html — the hyperlink counterpart of
  * [[HtmlText]]: extract every `<a href>` edge (with its anchor text) from
  * the page bytes, then rank pages with the fixed-point [[PageRank]] over
  * the extracted graph. On Common-Crawl-shaped input this is how the page
  * importance signal (a standard curation quality prior) and the KG's
  * document-level edges are actually built.
  *
  * Scale design: extraction is a codegen'd `regexp_extract_all` inside the
  * scan's projection — one pass over the html bytes, no UDF, no parser
  * object per row; the explode multiplies rows by links-per-page (a small
  * constant on real pages), and everything downstream (dedup to distinct
  * edges, PageRank) is keyed shuffles that PageRank already materializes
  * once. The same RE2-compatible pattern runs in DuckDB for the oracle. */
object WebGraph {

  /** href + anchor-text pattern (RE2-compatible: no backrefs/lookarounds). */
  val HrefPattern = "<a href=\"([^\"]+)\">([^<]*)</a>"

  /** (src, dst, anchor) — one row per anchor occurrence, duplicates kept
    * (they are real signal: multiple links to the same target). */
  def links(pages: DataFrame): DataFrame = {
    val h = col("html").cast("string")
    pages.select(col("url").as("src"),
      explode(arrays_zip(
        regexp_extract_all(h, lit(HrefPattern), lit(1)),
        regexp_extract_all(h, lit(HrefPattern), lit(2)))).as("z"))
      .select(col("src"), col("z.0").as("dst"), col("z.1").as("anchor"))
  }

  /** PageRank over the extracted link graph (distinct edges — dedup happens
    * inside [[PageRank.run]]). Bit-deterministic fixed-point ranks. */
  def pagerank(pages: DataFrame, iterations: Int = 10): DataFrame =
    PageRank.run(links(pages).select("src", "dst"), iterations)

  /** q65 oracle: the identical RE2 extraction over the pinned pages. */
  def oracleSqlLinks(pagesPin: String): String =
    s"""WITH p AS (SELECT url, decode(html) AS h FROM '$pagesPin'),
          d AS (SELECT url AS src,
                regexp_extract_all(h, '$HrefPattern', 1) AS dsts,
                regexp_extract_all(h, '$HrefPattern', 2) AS anchors FROM p),
          u AS (SELECT src, unnest(dsts) AS dst, unnest(anchors) AS anchor FROM d)
       SELECT src, dst, anchor FROM u"""

  /** The q66 oracle's edge set: distinct (src, dst) re-extracted from the
    * pin — feeds the shared unrolled-PageRank SQL generator. */
  def oracleEdgeSql(pagesPin: String): String =
    s"""SELECT DISTINCT src, dst FROM (
          SELECT url AS src,
                 unnest(regexp_extract_all(decode(html), '<a href="([^"]+)"', 1)) AS dst
          FROM '$pagesPin')"""
}
