package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-host mirror detection — the crawl-frontier dedup case URL
  * canonicalization can't reach: the SAME rendered content served from
  * DIFFERENT hosts (mirror sites, CDNs, scraped republications). Fingerprint
  * the EXTRACTED text (not the raw bytes — headers/footers injected by the
  * mirror host would defeat a byte hash; [[HtmlText]]'s chain is the
  * per-url-byte-identical extraction the north rule already gates), group by
  * fingerprint, and report groups spanning ≥ 2 hosts.
  *
  * Scale: fingerprinting is scan-rate codegen'd regex + md5; the only
  * shuffle carries (fp, url, host) slim rows — content bytes never move.
  * Same-host duplicates (url params, session ids) are NOT reported here:
  * that is q75's url-canonicalization job; the host-distinct filter keeps
  * this operator's answer the mirror set specifically. */
object Mirrors {

  /** (text_fp, n_urls, n_hosts, canonical_url) for every extracted-text
    * fingerprint served by ≥ 2 distinct hosts; canonical = min url. */
  def detect(pages: DataFrame): DataFrame =
    pages.select(md5(HtmlText.htmlToText(col("html"))).as("text_fp"),
        col("url"), WebGraph.host(col("url")).as("host"))
      .groupBy("text_fp")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"),
        min(col("url")).as("canonical_url"))
      .filter(col("n_hosts") >= 2)

  /** DuckDB oracle over a (url, html binary) pages SQL: identical
    * extraction chain, md5, and host grouping. */
  def oracleSql(pagesSql: String): String =
    s"""WITH fp AS (SELECT md5(${HtmlText.sqlExpr("html")}) AS text_fp, url,
                    regexp_extract(url, '^https?://([^/]+)', 1) AS host
                    FROM ($pagesSql))
       SELECT text_fp, CAST(count(*) AS BIGINT) AS n_urls,
              CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
              min(url) AS canonical_url
       FROM fp GROUP BY text_fp HAVING count(DISTINCT host) >= 2"""
}
