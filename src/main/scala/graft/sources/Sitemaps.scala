package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemap.xml extraction — the crawl DISCOVERY complement of
  * [[Robots]]' politeness filter (sitemaps.org protocol, referenced by
  * RFC 9309's `Sitemap:` pointer): sites publish the URLs they want
  * crawled plus freshness hints, and a production frontier builder
  * unions sitemap entries with discovered links before the robots
  * verdict and the already-crawled anti-join.
  *
  * Implements the `<urlset>` subset with a deliberate regexp extractor
  * rather than an XML parser: real-world sitemaps are frequently
  * non-well-formed (unescaped ampersands, truncated tails), and the
  * published crawler behavior is salvage-what-matches, not
  * reject-the-document. `<url>…</url>` blocks yield (loc, lastmod);
  * whitespace inside tags trims; entries without a `<loc>` drop;
  * `<sitemap>` INDEX blocks (nested sitemap pointers) are not urlset
  * entries and are ignored by construction — the block regex matches
  * only `<url>` elements. lastmod stays a raw string (the protocol
  * allows both dates and full W3C datetimes; parsing is the
  * scheduler's cast).
  *
  * Every step is regexp + trim, so q_warc_sitemap replays the ENTIRE
  * extraction in DuckDB (RE2 `(?s)` non-greedy blocks, same patterns).
  * Scale shape: per-row regexp work, one explode — embarrassingly
  * parallel, no shuffle; sitemap bodies are per-host and bounded (the
  * protocol caps one file at 50k URLs / 50 MB). */
object Sitemaps {

  /** Extract urlset entries from sitemap bodies (`host`, `body`) →
    * (host, url, lastmod); lastmod NULL when absent. */
  def entries(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(col("host"),
        explode(expr(
          "regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1)"))
          .as("block"))
      .select(col("host"),
        regexp_extract(col("block"),
          "(?s)<loc>\\s*(.*?)\\s*</loc>", 1).as("url"),
        nullif(regexp_extract(col("block"),
          "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1), lit(""))
          .as("lastmod"))
      .filter(col("url") =!= "")
}
