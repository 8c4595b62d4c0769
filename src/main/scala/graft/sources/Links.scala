package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink extraction and relative-URL resolution — the step that
  * turns a cracked crawl into the WEB GRAPH every published curation
  * prior consumes: host-level PageRank/TrustRank seeds (Common Crawl
  * publishes exactly this host graph), HITS hubs, anchor-text signals,
  * and frontier discovery all start from "which page links where, with
  * what text".
  *
  * Extraction is the [[Sitemaps]] discipline — deliberate
  * salvage-what-matches regexps, not an HTML parser: real crawled HTML
  * is overwhelmingly non-well-formed and the published extractors keep
  * whatever parses. `<a …href=…>anchor</a>` occurrences yield
  * (href, anchor); href accepts double-quoted, single-quoted, and
  * unquoted forms plus case-insensitive tag/attr names; `<link>` /
  * `<area>` and href-less anchors never match by construction; anchor
  * text is tag-stripped and whitespace-collapsed. `&amp;` decodes in
  * hrefs (the one entity that routinely appears in query strings);
  * other entities pass through raw.
  *
  * Resolution implements the RFC 3986 §5 cases a crawler meets:
  * fragment stripping (a fragment-only link drops), non-http(s) schemes
  * drop (javascript:/mailto:/data:/…), absolute http(s) passes through,
  * scheme-relative `//host/p` takes the base scheme, root-relative
  * `/p` takes the base origin, and relative paths resolve against the
  * base directory with §5.2.4 dot-segment removal. Dot-segment removal
  * is a BOUNDED unrolled regexp chain ([[normSteps]] — the same step
  * list emits both the Catalyst expression chain and the DuckDB oracle
  * SQL, so the two engines cannot drift): each round collapses one
  * level of `/seg/../` (leftmost-first, so a real segment always
  * collapses before a `..` can self-match — pops-from-empty-root
  * collapse exactly like RFC remove_dot_segments' no-op pops), and a
  * path still carrying dot segments after [[NormRounds]] rounds is
  * DROPPED as malformed (salvage-what-matches: bounded-depth
  * incomplete normalization becomes a drop, never a wrong URL).
  * A `<base href>` in the page overrides the resolution base (HTML's
  * one document-wide resolution control, honored by every browser and
  * published extractor): the FIRST base tag's href — itself resolved
  * against the page URL when root-relative — replaces the page URL for
  * origin/scheme/directory derivation; absolute links are unaffected.
  * Deliberately out of scope (documented, like Robots' wildcards):
  * relative `<base>` hrefs (rare and self-referential), percent-encoding
  * normalization, and dot segments inside query strings.
  *
  * Every step is per-row regexp + one explode — embarrassingly
  * parallel, zero shuffle until the caller aggregates; the host-graph
  * rollup ([[hostEdges]]) is one hash aggregate whose output is bounded
  * by host PAIRS, not pages. q_warc_links / q_warc_hostgraph /
  * q_graph_linkrank replay the ENTIRE chain in DuckDB from the restated
  * closed-form fixture bodies.
  *
  * Reference anchor: repype/pipeline.py:79-118 (stages consuming
  * upstream artifacts by field name — here pages feed the link stage
  * exactly as images feed seg stages).
  */
object Links {

  /** One `<a …href=…>…</a>` occurrence, whole match. Attribute values
    * must not contain `>` (HTML allows it quoted; crawled reality and
    * RE2's lack of backreferences both say salvage, skip those). */
  private[sources] val ATagRe: String =
    "(?is)<a\\s[^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>.*?</a>"

  /** The href token (still quoted) out of one match. */
  private[sources] val HrefRe: String =
    "(?is)href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"

  /** The anchor body out of one match (greedy: the match itself ends at
    * the first `</a>`, so the group is exact). */
  private[sources] val AnchorRe: String = "(?is)^<a[^>]*>(.*)</a>$"

  /** The FIRST `<base …href=…>` tag's href (HTML allows one; browsers
    * use the first). Applied document-wide regardless of position. */
  private[sources] val BaseTagRe: String =
    "(?is)<base\\s[^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"

  /** Rounds of dot-segment collapse: each round pops ONE level of every
    * adjacent `/../` run (plus the whole root-level no-op run at once),
    * so chains up to [[NormRounds]] real pops deep resolve; deeper
    * chains drop via [[ResidualDotRe]]. */
  val NormRounds = 10

  /** A path segment that is neither `.` nor `..` (those are operators,
    * not segments): starts with a non-dot, or is a dotted name longer
    * than the operators. CRITICAL correctness guard — if the collapse
    * pattern's segment could match `..`, a `/../../` pair would
    * self-collapse while a REAL segment to its left was still unpopped
    * (two no-op pops where RFC does one real pop + one no-op), emitting
    * a WRONG URL instead of residue. Found by the randomized
    * RFC-equivalence property in LinksSpec. */
  private val Seg = "(\\.\\.[^/]+|\\.[^./][^/]*|[^./][^/]*)"

  /** RFC 3986 §5.2.4 remove_dot_segments as a bounded (pattern →
    * replacement) chain, applied in order; shared verbatim between the
    * engine ([[removeDotSegments]]) and the oracle SQL
    * ([[normalizeSql]]). The mid pattern deliberately carries NO
    * leading slash (matching starts at the segment, replacement is
    * empty): a leading-slash form consumes the '/' the NEXT candidate
    * needs, so a global pass would skip alternating collapses — the
    * second bug the randomized property caught. No lookarounds anywhere
    * (the oracle runs on RE2, which has none). */
  private[sources] val normSteps: Seq[(String, String)] = {
    val dot = Seq.fill(3)("/\\./" -> "/") :+ ("/\\.$" -> "/")
    val dotdot = (1 to NormRounds).flatMap { _ =>
      Seq("^(/\\.\\.)+/" -> "/", // the whole root-level no-op run
        s"$Seg/\\.\\./" -> "") // pop one real segment per run
    }
    // trailing `..` (no slash after) pops once; a lone root `/..`
    // clamps to root
    val tail = Seq("/" + Seg + "/\\.\\.$" -> "/", "^/\\.\\.$" -> "/")
    dot ++ dotdot ++ tail
  }

  /** A path still carrying dot segments after normalization (deeper
    * than [[NormRounds]] or degenerate) — malformed, drop the link. */
  private[sources] val ResidualDotRe: String = "/\\.\\./|/\\./|/\\.\\.$|/\\.$"

  /** Non-fragment schemes a crawler never follows: anything with an
    * explicit scheme that is not http(s). */
  private[sources] val OtherSchemeRe: String = "^(?i)[a-z][a-z0-9+.-]*:"
  private[sources] val HttpRe: String = "^(?i)https?://"

  /** [[normSteps]] precompiled once per JVM for the expression below. */
  private val compiledNormSteps: Array[(java.util.regex.Pattern, String)] =
    normSteps.map { case (p, r) =>
      (java.util.regex.Pattern.compile(p), r)
    }.toArray

  /** The step chain as ONE JVM call (Java `replaceAll` over the same
    * patterns in the same order ≡ the nested regexp_replace chain ≡ the
    * oracle SQL — character-identical semantics, three runtimes).
    * Static entry point of [[graft.functions.DotSegmentNormalizeExpr]];
    * the no-dot fast path skips all 16 passes for the overwhelming
    * majority of real URLs. */
  def removeDotSegments(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    var cur = s.toString
    if (!cur.contains("/.")) return s
    var i = 0
    while (i < compiledNormSteps.length) {
      cur = compiledNormSteps(i)._1.matcher(cur)
        .replaceAll(compiledNormSteps(i)._2)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(cur)
  }

  /** The SAME chain as DuckDB SQL over the expression `inner`. */
  private[sources] def normalizeSql(inner: String): String =
    normSteps.foldLeft(inner) { case (acc, (p, r)) =>
      s"regexp_replace($acc, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
    }

  /** Single-quoted SQL literal (internal quotes doubled). */
  private[sources] def sqlLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  // ------------------------------------------------------------------
  // JVM extraction core. The first cut expressed extraction +
  // resolution as a chain of built-in string expressions; Spark cannot
  // split oversized expression code inside a Generate (explode) consume
  // path, so the chain exceeded Janino's method-size limit (caught by
  // the fallback-disabled plan pin) and re-scanned the page html once
  // per regex besides. One codegen'd expression over per-JVM
  // precompiled java.util.regex Patterns — the SAME patterns, in the
  // SAME order, as the oracle's SQL chain — fixes both: the per-row
  // code is one static call, and each pattern runs once per page.
  // ------------------------------------------------------------------

  private def pat(re: String) = java.util.regex.Pattern.compile(re)
  private val ATagP = pat(ATagRe)
  private val HrefP = pat(HrefRe)
  private val AnchorP = pat(AnchorRe)
  private val BaseTagP = pat(BaseTagRe)
  private val FragP = pat("#.*$")
  private val TagStripP = pat("<[^>]*>")
  private val WsP = pat("[ \\t\\r\\n]+")
  private val HttpP = pat(HttpRe)
  private val OtherSchemeP = pat(OtherSchemeRe)
  private val ResidualP = pat(ResidualDotRe)
  private val OriginP = pat("^(https?://[^/]+)")
  private val SchemeP = pat("^([a-z]+):")
  private val BasePathP = pat("^https?://[^/]+(/.*)?$")
  private val LastSegP = pat("[^/]*$")
  private val BaseQueryP = pat("\\?.*$")

  /** regexp_extract semantics: first match's group 1, else "". */
  private def rex(p: java.util.regex.Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Spark trim(c, chars) semantics for the quote set. */
  private def trimQuotes(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && (s.charAt(a) == '"' || s.charAt(a) == '\'')) a += 1
    while (b > a && (s.charAt(b - 1) == '"' || s.charAt(b - 1) == '\'')) b -= 1
    s.substring(a, b)
  }

  private val TabNlP = pat("[\\t\\r\\n]+")

  /** URL Standard pre-parse cleanup: ASCII tab/CR/LF removed anywhere
    * in a URL token. */
  private def stripTabNl(s: String): String =
    if (s.indexOf('\n') < 0 && s.indexOf('\r') < 0 && s.indexOf('\t') < 0) s
    else TabNlP.matcher(s).replaceAll("")

  /** Spark trim() semantics: spaces only (NOT Java's <=0x20 trim). */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** [[removeDotSegments]] on a plain String. */
  private def removeDotSegmentsStr(s: String): String = {
    if (!s.contains("/.")) return s
    var cur = s
    var i = 0
    while (i < compiledNormSteps.length) {
      cur = compiledNormSteps(i)._1.matcher(cur)
        .replaceAll(compiledNormSteps(i)._2)
      i += 1
    }
    cur
  }

  /** Output element type of [[extractResolved]]. */
  val LinkStructType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("base_url",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("href",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("anchor",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("link_url",
        org.apache.spark.sql.types.StringType, nullable = true)))

  /** One page -> every `<a href>` occurrence as
    * (base_url, href, anchor, link_url); link_url is NULL for dropped
    * links (fragment-only, non-http(s) scheme, residual dot depth).
    * Static entry point of [[graft.functions.ExtractLinksExpr]]. */
  def extractResolved(urlU: org.apache.spark.unsafe.types.UTF8String,
                      htmlU: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val url = urlU.toString
    val html = htmlU.toString
    // effective base: first <base href>, absolute or root-relative
    val rawBase = stripTabNl(trimQuotes(rex(BaseTagP, html)))
    val baseUrl =
      if (HttpP.matcher(rawBase).find()) rawBase
      else if (rawBase.startsWith("/") && !rawBase.startsWith("//"))
        rex(OriginP, url) + rawBase
      else url
    val origin = rex(OriginP, baseUrl)
    val scheme = rex(SchemeP, baseUrl)
    // RFC 3986 s5.3: the base QUERY never participates in resolution —
    // a query-only reference REPLACES it, and merge-paths uses the base
    // path sans query (a query may legally contain '/', so stripping
    // here also keeps basedir correct for bases like /p?a=/x).
    val basepath0 = BaseQueryP.matcher(rex(BasePathP, baseUrl))
      .replaceAll("")
    val basepath = if (basepath0.isEmpty) "/" else basepath0
    val basedir = LastSegP.matcher(basepath).replaceAll("")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val mm = ATagP.matcher(html)
    while (mm.find()) {
      val m = mm.group(0)
      // the URL Standard strips ASCII tab/newline from URLs before
      // parsing (browsers do; multiline quoted hrefs are real crawled
      // HTML) — and it removes the one case where Java's '$' (matches
      // before a FINAL newline) and the oracle's RE2 '$' (end of text
      // only) would diverge on the fragment strip
      val href = FragP.matcher(
        stripTabNl(trimQuotes(rex(HrefP, m))).replace("&amp;", "&"))
        .replaceAll("")
      val anchor = trimSpaces(WsP.matcher(
        TagStripP.matcher(rex(AnchorP, m)).replaceAll(" "))
        .replaceAll(" "))
      val linkUrl: String =
        if (href.isEmpty) null
        else if (HttpP.matcher(href).find()) href
        else if (OtherSchemeP.matcher(href).find()) null
        else if (href.startsWith("//")) scheme + ":" + href
        // RFC 3986 s5.3: query-only keeps the base DOCUMENT path
        else if (href.startsWith("?")) origin + basepath + href
        else {
          val np = removeDotSegmentsStr(
            if (href.startsWith("/")) href else basedir + href)
          if (ResidualP.matcher(np).find()) null else origin + np
        }
      def u(x: String) =
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
      out += org.apache.spark.sql.catalyst.InternalRow(
        u(baseUrl), u(href), u(anchor),
        if (linkUrl == null) null else u(linkUrl))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Raw (href, anchor) occurrences per page. Input: (`url`, `html`).
    * Output: (url, base_url, href, anchor) — base_url is the effective
    * resolution base (the first `<base href>` when absolute or
    * root-relative, else the page URL); href quote-stripped,
    * `&amp;`-decoded, fragment-stripped (may be empty = fragment-only);
    * anchor tag-stripped, whitespace-collapsed, trimmed. */
  def rawLinks(pages: DataFrame): DataFrame =
    pages
      .select(col("url"),
        explode(graft.functions.TextExpressions.extractLinks(
          col("url"), col("html"))).as("l"))
      .select(col("url"), col("l.base_url").as("base_url"),
        col("l.href").as("href"), col("l.anchor").as("anchor"))

  /** Resolved outgoing links per page: (page_url, link_url, anchor) —
    * one row per occurrence; fragment-only, non-http(s)-scheme, and
    * malformed-dot-depth links are dropped. Relative links resolve
    * against the EFFECTIVE base (the page URL unless a `<base href>`
    * overrides it); a query-only reference keeps the base DOCUMENT
    * path (RFC 3986 s5.3). */
  def resolved(pages: DataFrame): DataFrame =
    pages
      .select(col("url").as("page_url"),
        explode(graft.functions.TextExpressions.extractLinks(
          col("url"), col("html"))).as("l"))
      .filter(col("l.link_url").isNotNull)
      .select(col("page_url"), col("l.link_url").as("link_url"),
        col("l.anchor").as("anchor"))

  /** Host-level web-graph edges off [[resolved]]'s output:
    * (src_host, dst_host, n_links), intra-host edges excluded — the
    * Common Crawl host-graph shape PageRank/TrustRank/HITS consume.
    * Output is bounded by host PAIRS; one hash aggregate. */
  def hostEdges(links: DataFrame): DataFrame =
    links
      .select(
        regexp_extract(col("page_url"), "^https?://([^/]+)", 1)
          .as("src_host"),
        regexp_extract(col("link_url"), "^https?://([^/]+)", 1)
          .as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** DuckDB replay of [[rawLinks]] + [[resolved]]: expects a CTE
    * `pages(url, html)` in scope, yields
    * `linkrows(page_url, link_url, anchor)`. Shared verbatim by the
    * q_warc_links / q_warc_hostgraph / q_graph_linkrank oracles so the
    * three cannot drift. */
  def linksExtractCtesSql: String = {
    val norm = normalizeSql(
      "CASE WHEN starts_with(href, '/') THEN href ELSE basedir || href END")
    s"""lbm AS (
       |  SELECT url, html,
       |    regexp_replace(
       |      trim(regexp_extract(html, ${sqlLit(BaseTagRe)}, 1),
       |        '"' || chr(39)),
       |      '[\\t\\r\\n]+', '', 'g') AS rawbase
       |  FROM pages),
       |lm AS (
       |  SELECT url,
       |    CASE
       |      WHEN regexp_matches(rawbase, ${sqlLit(HttpRe)}) THEN rawbase
       |      WHEN starts_with(rawbase, '/')
       |        AND NOT starts_with(rawbase, '//') THEN
       |        regexp_extract(url, '^(https?://[^/]+)', 1) || rawbase
       |      ELSE url END AS base_url,
       |    unnest(regexp_extract_all(html, ${sqlLit(ATagRe)}, 0)) AS m
       |  FROM lbm),
       |lraw AS (
       |  SELECT url, base_url,
       |    regexp_replace(replace(regexp_replace(
       |      trim(regexp_extract(m, ${sqlLit(HrefRe)}, 1), '"' || chr(39)),
       |      '[\\t\\r\\n]+', '', 'g'),
       |      '&amp;', '&'), '#.*$$', '') AS href,
       |    trim(regexp_replace(regexp_replace(
       |      regexp_extract(m, ${sqlLit(AnchorRe)}, 1),
       |      '<[^>]*>', ' ', 'g'), '[ \\t\\r\\n]+', ' ', 'g')) AS anchor
       |  FROM lm),
       |lbp AS (
       |  SELECT url, href, anchor, base_url,
       |    CASE WHEN regexp_replace(regexp_extract(base_url,
       |        '^https?://[^/]+(/.*)$$', 1), '\\?.*$$', '') = ''
       |      THEN '/'
       |      ELSE regexp_replace(regexp_extract(base_url,
       |        '^https?://[^/]+(/.*)$$', 1), '\\?.*$$', '')
       |      END AS basepath
       |  FROM lraw),
       |lbase AS (
       |  SELECT url, href, anchor, basepath,
       |    regexp_extract(base_url, '^(https?://[^/]+)', 1) AS origin,
       |    regexp_extract(base_url, '^([a-z]+):', 1) AS scheme,
       |    regexp_replace(basepath, '[^/]*$$', '') AS basedir
       |  FROM lbp),
       |lnorm AS (
       |  SELECT url, href, anchor, origin, scheme, basepath,
       |    $norm AS npath
       |  FROM lbase),
       |lres AS (
       |  SELECT url AS page_url, anchor,
       |    CASE
       |      WHEN href = '' THEN NULL
       |      WHEN regexp_matches(href, ${sqlLit(HttpRe)}) THEN href
       |      WHEN regexp_matches(href, ${sqlLit(OtherSchemeRe)}) THEN NULL
       |      WHEN starts_with(href, '//') THEN scheme || ':' || href
       |      WHEN starts_with(href, '?') THEN origin || basepath || href
       |      WHEN regexp_matches(npath, ${sqlLit(ResidualDotRe)}) THEN NULL
       |      ELSE origin || npath
       |    END AS link_url
       |  FROM lnorm),
       |linkrows AS (
       |  SELECT page_url, link_url, anchor FROM lres
       |  WHERE link_url IS NOT NULL)""".stripMargin
  }
}
