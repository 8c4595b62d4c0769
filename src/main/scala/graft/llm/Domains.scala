package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-level corpus filters — the FIRST stage of published
  * web-corpus pipelines (the CCNet / RefinedWeb shape): extract each
  * document's registrable domain, drop blocklisted domains, and cap the
  * per-domain document count so no single site dominates the corpus.
  *
  * Scale shape: domain extraction is per-row string arithmetic (no
  * shuffle, codegen'd); the blocklist — even a multi-million-row one —
  * broadcasts for the anti-join; the per-domain cap is one hash-ordered
  * window, WindowGroupLimit-prunable exactly like q_quota_per_key, so
  * the shuffle carries (domain, doc_id, hash) — never text.
  */
object Domains {

  /** Host of a URL: the authority between the FIRST "://" and the next
    * '/' or '?'. The cut after the scheme is length-based — a
    * last-occurrence split would re-parse any URL whose query embeds
    * another URL ("?next=https://b.com/x") as the embedded one, the
    * classic crawl-data parsing trap. A scheme-less or protocol-relative
    * URL ("ex.com/path") has no "://" to cut at; the whole prefix before
    * the first '/' or '?' is the host then — WITHOUT this branch the
    * length-based cut would run past the end and return "", pooling
    * every scheme-less row under one empty domain key (shared quota,
    * un-blocklistable). Pure string ops, stated identically by the
    * DuckDB oracle with split_part (which also splits on the first
    * occurrence). */
  def hostOf(url: Column): Column = {
    val scheme = substring_index(url, "://", 1)
    val rest = when(instr(url, "://") > 0, substr(url, length(scheme) + lit(4)))
      .otherwise(url)
    substring_index(substring_index(rest, "/", 1), "?", 1)
  }

  /** Registrable domain of a host under the bundled Public Suffix List
    * ([[Psl]]): one label more than the longest matching public-suffix
    * rule, with wildcard (`*.ck`) and exception (`!www.ck`) rules
    * honored — "news.bbc.co.uk" → "bbc.co.uk", "a.src.github.io" →
    * "src.github.io", "a.b.ck" → "a.b.ck" (wildcard), "www.ck" →
    * "www.ck" (exception). A single-label host (e.g. "localhost", an
    * intranet name) or a host that IS a public suffix keeps itself —
    * an empty-string domain would silently pool every such doc under
    * one key for the blocklist and the per-domain cap. Per-row codegen'd
    * native expression; the rule data ships in the jar (no broadcast,
    * no join). */
  def registrableDomain(host: Column): Column =
    graft.functions.TextExpressions.registrableDomain(host)

  /** URL canonicalization — the dedup key published web pipelines (C4,
    * CCNet) group on before any content hashing: the same page is
    * crawled under case-varied hosts, explicit default ports, tracking
    * parameters, fragments, and trailing slashes. Rules applied (pure
    * string/regex ops, every one restated by the DuckDB oracle):
    * lowercase scheme+host, drop an explicit :80/:443, strip the
    * fragment, drop utm_* query parameters (keeping the others in
    * order), drop a then-empty query entirely, strip a trailing path
    * slash. Per-row and codegen'd — no shuffle, no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    // FIRST '://' — a last-occurrence split would re-parse any URL whose
    // query embeds another URL ("?next=https://b.com/x") as the embedded
    // one (see hostOf)
    val scheme = substring_index(noFrag, "://", 1)
    val rest = substr(noFrag, length(scheme) + lit(4))
    // host ends at the first '/' OR '?' — a query with no path
    // ("ex.com?x=1") must not absorb into the host (it would dodge the
    // port/utm rules and get wrongly lowercased)
    val host = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathQ = substr(rest, length(host) + 1)
    val pathOnly = substring_index(pathQ, "?", 1)
    val qs = when(instr(pathQ, "?") > 0,
      substr(pathQ, length(pathOnly) + 2)).otherwise(lit(""))
    // parameter-wise filter, not a regex: an unanchored 'utm_' pattern
    // would also fire on param names/values merely CONTAINING utm_
    // ("?xutm_b=1", "?q=utm_test") and corrupt the query
    val qClean = array_join(
      filter(split(qs, "&"), p => !p.startsWith("utm_")), "&")
    // only the scheme's OWN default port is redundant: http://x:443 is a
    // different origin than http://x and must not merge with it
    val schemeLower = lower(scheme)
    val hostLower = lower(host)
    val hostClean =
      when(schemeLower === "http",
        regexp_replace(hostLower, lit(":80$"), lit("")))
        .when(schemeLower === "https",
          regexp_replace(hostLower, lit(":443$"), lit("")))
        .otherwise(hostLower)
    // strip ALL trailing slashes — '/a//' must canonicalize in one
    // application (idempotence: the LlmProps projection property)
    val pathClean = regexp_replace(pathOnly, lit("/+$"), lit(""))
    concat(lower(scheme), lit("://"), hostClean, pathClean,
      when(qClean =!= "", concat(lit("?"), qClean)).otherwise(lit("")))
  }

  /** The full filter: annotate with the registrable domain, anti-join
    * the blocklist (broadcast — blocklists are small next to the
    * corpus), and keep at most `maxPerDomain` documents per domain,
    * selected by the same deterministic md5-of-id order as
    * q_quota_per_key (rerun- and cluster-size-stable, unbiased w.r.t.
    * content). Returns the kept rows with their `domain` column. */
  def filterByDomain(docs: DataFrame, urlCol: String, idCol: String,
                     blocklist: DataFrame, maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be > 0, got $maxPerDomain")
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs
      // normalize the host before extraction: case-varied crawls of one
      // site ("Ex.com"/"ex.com") and explicit ports ("ex.com:8080")
      // must land on ONE domain key, or they dodge the blocklist and
      // each get their own per-domain quota
      .withColumn("domain", registrableDomain(
        regexp_replace(lower(hostOf(col(urlCol))), lit(":[0-9]+$"),
          lit(""))))
      .join(broadcast(blocklist), Seq("domain"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerDomain)
      .drop("rn")
  }
}
