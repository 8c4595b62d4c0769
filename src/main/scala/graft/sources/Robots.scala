package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and longest-match URL filtering — the crawl
  * politeness/curation step every published web pipeline runs before
  * ingest (C4, CCNet and RefinedWeb all filter fetched URLs against the
  * host's Robots Exclusion Protocol rules; Common Crawl's own fetcher
  * obeys them upstream).
  *
  * Implements the line-oriented core of RFC 9309:
  *  - `key: value` lines; keys case-insensitive among `user-agent` /
  *    `allow` / `disallow`; `#` starts a comment (full-line or
  *    trailing); other directives (crawl-delay, sitemap, …) are ignored
  *    and do NOT terminate a group (nor do blank lines — RFC 9309
  *    dropped the 1994 draft's blank-line separators);
  *  - CONSECUTIVE user-agent lines head ONE group (the RFC multi-agent
  *    form: `User-agent: a\nUser-agent: b\nDisallow: /x` binds the rule
  *    to both); a user-agent line after a rule line starts a new group;
  *    rules before any user-agent line are invalid and dropped;
  *  - an EMPTY Allow/Disallow value matches nothing and is dropped
  *    (RFC 9309 §2.2.2: an empty Disallow permits everything);
  *  - group choice per host: the exact (case-insensitive) product-token
  *    group if the host has one, else the `*` group; rules of every
  *    matching group merge (the RFC merge rule for repeated groups);
  *  - rule choice per URL: the most specific (longest-pattern) match;
  *    Allow wins length ties; no matching rule → allowed. Patterns
  *    support RFC 9309 §2.2.3's TWO special characters: `*` matches any
  *    character run and a TRAILING `$` anchors the pattern to the URL
  *    end (a `$` anywhere else is literal, the published-parser
  *    behavior). A pattern without specials is a pure prefix — which
  *    deliberately matches mid-segment (`Disallow: /tmp` blocks
  *    `/tmpfile`, exactly as published parsers do). Matching compiles
  *    each pattern to an anchored regex through [[patternSteps]], a
  *    LITERAL-replace step list shared verbatim with the oracle SQL
  *    ([[ruleRegexSql]]) so the two engines cannot drift; specificity
  *    is raw pattern length (the Google-documented rule).
  *
  * Every step is deterministic integer/string work, so q_warc_robots
  * replays the ENTIRE parse + match in DuckDB from the restated
  * closed-form bodies — parser and filter are both hash-checked against
  * an independent SQL implementation.
  *
  * Scale shape: robots bodies are per-HOST and small (the rules table
  * is KB-to-MB at web scale — bounded by hosts, not pages), so parsing
  * windows partition by host over a few dozen rows each, and the page
  * filter is ONE broadcast equi-join on host (with the prefix predicate
  * as the join filter) plus one hash aggregate per page — page text
  * never shuffles, and the crawl side stays embarrassingly parallel. */
object Robots {

  // the shared explicit trim — Spark's trim() strips only spaces and
  // DuckDB's only spaces; \t and a CRLF file's trailing \r must strip
  // identically in both engines, so both use this regex
  private def rtrim(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^[ \\t\\r]+|[ \\t\\r]+$", "")

  /** Pattern-body → regex-body conversion as LITERAL (search, replace)
    * steps — literal `replace`, never regexp_replace, so the emitted
    * Scala chain and SQL chain are character-identical (backref syntax
    * differs between Java regex and RE2 replacements; literal steps
    * sidestep it). Backslash escapes first; `*` becomes `.*` last. */
  private[sources] val patternSteps: Seq[(String, String)] =
    Seq("\\" -> "\\\\", "." -> "\\.", "^" -> "\\^", "$" -> "\\$",
      "+" -> "\\+", "?" -> "\\?", "(" -> "\\(", ")" -> "\\)",
      "[" -> "\\[", "]" -> "\\]", "{" -> "\\{", "}" -> "\\}",
      "|" -> "\\|", "*" -> ".*")

  /** Anchored match regex for a rule pattern column: `^` + converted
    * body + (`$` when the pattern ends in `$`). An unanchored pattern's
    * regex SEARCH with the leading `^` is exactly RFC prefix matching
    * ("the pattern matches some prefix of the path"). */
  private[sources] def ruleRegex(prefix: org.apache.spark.sql.Column) = {
    val anchored = prefix.endsWith("$")
    val body = when(anchored, prefix.substr(lit(1), length(prefix) - 1))
      .otherwise(prefix)
    val converted = patternSteps.foldLeft(body) { case (c, (a, b)) =>
      replace(c, lit(a), lit(b))
    }
    concat(lit("^"), converted, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** The SAME conversion as DuckDB SQL over a column expression `inner`
    * (used by the q_warc_robots / q_warc_sitemap oracle CTEs). */
  private[graft] def ruleRegexSql(inner: String): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val body = s"CASE WHEN $inner LIKE '%$$' THEN " +
      s"substring($inner, 1, length($inner) - 1) ELSE $inner END"
    val converted = patternSteps.foldLeft(body) { case (c, (a, b)) =>
      s"replace($c, ${lit(a)}, ${lit(b)})"
    }
    s"'^' || $converted || CASE WHEN $inner LIKE '%$$' THEN '$$' ELSE '' END"
  }

  /** Parse robots.txt bodies into the merged rule table
    * (host, agent, is_allow, prefix). Input: one row per host with the
    * raw body text (`host`, `body`). */
  def rules(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("body"), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        rtrim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val dirs = lines
      .select(col("host"), col("ln"),
        lower(rtrim(regexp_extract(col("line"), "^([^:]+):", 1))).as("key"),
        rtrim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    // group id = running count of user-agent lines that FOLLOW a
    // non-user-agent line (consecutive UA lines share one group)
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grps = dirs
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, 0).over(w))
      .withColumn("grp",
        sum(when(col("is_ua") === 1 && col("prev_ua") === 0, 1)
          .otherwise(0)).over(w))
    val agents = grps.filter(col("is_ua") === 1)
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
      .distinct()
    val ruleRows = grps
      .filter(col("is_ua") === 0 && col("value") =!= "")
      .select(col("host"), col("grp"),
        (col("key") === "allow").cast("int").as("is_allow"),
        col("value").as("prefix"))
    agents.join(ruleRows, Seq("host", "grp"))
      .select(col("host"), col("agent"), col("is_allow"), col("prefix"))
      .distinct()
  }

  /** Per-host crawl-delay for one crawler token — the de-facto
    * politeness directive (not in RFC 9309 but honored by Bing/Yandex
    * and emitted by most sites; Google ignores it): the scheduler input
    * next to [[allowed]]'s verdict. Grammar: a `crawl-delay: N` line
    * binds to the most recent user-agent run (consecutive UA lines =
    * one run, exactly [[rules]]' group shape); non-integer values are
    * ignored; group choice is [[allowed]]'s (exact token if the host
    * declares one for crawl-delay, else `*`); several bound delays
    * collapse to the MINIMUM (the conservative merge). Returns
    * (host, crawl_delay) only for hosts that declare one. */
  def delays(robots: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val lines = robots
      .select(col("host"),
        posexplode(split(col("body"), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        rtrim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val dirs = lines
      .select(col("host"), col("ln"),
        lower(rtrim(regexp_extract(col("line"), "^([^:]+):", 1))).as("key"),
        rtrim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grps = dirs
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", lag(col("is_ua"), 1, 0).over(w))
      .withColumn("grp",
        sum(when(col("is_ua") === 1 && col("prev_ua") === 0, 1)
          .otherwise(0)).over(w))
    val agents = grps.filter(col("is_ua") === 1)
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
      .distinct()
    val delayRows = grps
      .filter(col("is_ua") === 0 && col("value").rlike("^[0-9]+$"))
      .select(col("host"), col("grp"), col("value").cast("int").as("delay"))
    agents.join(delayRows, Seq("host", "grp"))
      .filter(col("agent") === a || col("agent") === "*")
      .groupBy(col("host"))
      .agg(
        min(when(col("agent") === a, col("delay"))).as("sd"),
        min(when(col("agent") === "*", col("delay"))).as("wd"))
      .select(col("host"),
        coalesce(col("sd"), col("wd")).as("crawl_delay"))
  }

  /** Longest-match verdict per crawled page for one crawler product
    * token. Input pages carry (`url`, `host`, `path`); `rulesDf` is
    * [[rules]]'s output (broadcast — bounded by hosts). Returns every
    * page row plus `allowed` and the winning `rule_prefix` (NULL when
    * no rule matched — allowed by default). */
  def allowed(pages: DataFrame, rulesDf: DataFrame,
              agent: String): DataFrame = {
    val a = agent.toLowerCase
    val hasSpecific = rulesDf.filter(col("agent") === a)
      .select(col("host")).distinct()
      .withColumn("has_specific", lit(1))
    val applicable = rulesDf
      .filter(col("agent") === a || col("agent") === "*")
      .join(hasSpecific, Seq("host"), "left")
      .filter(
        (coalesce(col("has_specific"), lit(0)) === 1 && col("agent") === a)
          || (coalesce(col("has_specific"), lit(0)) === 0
            && col("agent") === "*"))
      .select(col("host").as("r_host"), col("is_allow"), col("prefix"),
        length(col("prefix")).as("plen"),
        ruleRegex(col("prefix")).as("rx"))
    // one broadcast equi-join on host; the compiled-pattern predicate
    // rides as the join filter. Lexicographic max of (plen, is_allow,
    // prefix) IS the RFC rule: most specific pattern, Allow wins ties
    // (prefix as the final field makes the tie-break total and
    // engine-independent).
    //
    // The match runs on a CONTROL-CHAR-STRIPPED copy of the path (the
    // stripTabNl rationale from Links): Java regex '$' also matches
    // before a final newline while the oracle's RE2 '$' is end-of-text
    // only, so a path ending in \n would otherwise evaluate differently
    // on the two engines. (The compiled rule body itself is safe — the
    // patternSteps literal-escape means '\s' can never survive as a
    // metachar — the divergence enters only through the path value.)
    // The ORIGINAL path is what joins, groups, and returns.
    pages
      .withColumn("match_path",
        regexp_replace(col("path"), "[\\t\\n\\x0B\\f\\r]", ""))
      .join(broadcast(applicable),
        col("host") === col("r_host")
          && expr("match_path rlike rx"), "left")
      .groupBy(col("url"), col("host"), col("path"))
      .agg(max(when(col("plen").isNotNull,
        struct(col("plen"), col("is_allow"), col("prefix")))).as("best"))
      .select(col("url"), col("host"), col("path"),
        (col("best").isNull || col("best.is_allow") === 1).as("allowed"),
        col("best.prefix").as("rule_prefix"))
  }
}
