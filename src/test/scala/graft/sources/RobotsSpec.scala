package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the RFC 9309 subset: group formation, comment and
  * empty-value handling, case folding, specific-agent shadowing,
  * longest-prefix matching with the Allow tie-break. The q_warc_robots
  * oracle replays the same rules in SQL; this spec pins the hand-derived
  * expectations the oracle cannot state (parse-table shapes, refusal of
  * out-of-group rules). */
class RobotsSpec extends SparkSpec {

  private def rulesOf(body: String): Set[(String, Int, String)] = {
    import SparkSpec.spark.implicits._
    Robots.rules(Seq(("h", body)).toDF("host", "body"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
  }

  test("rules: consecutive user-agent lines head ONE group; a UA line " +
      "after a rule starts a new one; pre-group rules are dropped") {
    val body = Seq(
      "Disallow: /orphan",        // before any group: invalid, dropped
      "User-agent: a",
      "User-agent: b",            // same group as a
      "Disallow: /x",
      "User-agent: c",            // rule seen since → NEW group
      "Disallow: /y").mkString("\n")
    assert(rulesOf(body) == Set(
      ("a", 0, "/x"), ("b", 0, "/x"), ("c", 0, "/y")))
  }

  test("rules: comments strip (full-line and trailing), unknown " +
      "directives and blank lines do not split a group, empty " +
      "Allow/Disallow values match nothing and drop, keys fold case") {
    val body = Seq(
      "# preamble",
      "USER-AGENT: Bot",          // key and agent case-fold
      "Crawl-delay: 7",           // unknown directive: ignored, no split
      "",
      "DisAllow: /a   # trailing",
      "Sitemap: http://h/s.xml",  // ignored
      "Allow:",                   // empty value: dropped
      "Allow: /a/deep").mkString("\n")
    assert(rulesOf(body) == Set(("bot", 0, "/a"), ("bot", 1, "/a/deep")))
  }

  test("allowed: longest prefix wins, Allow wins exact ties, prefixes " +
      "match mid-segment, no rule means allowed") {
    import SparkSpec.spark.implicits._
    val rules = Seq(
      ("h", "*", 0, "/private/"),
      ("h", "*", 1, "/private/pub/"),
      ("h", "*", 0, "/tmp"),
      ("h", "*", 0, "/dup/"),
      ("h", "*", 1, "/dup/")).toDF("host", "agent", "is_allow", "prefix")
    val pages = Seq("/private/x", "/private/pub/y", "/tmp/z", "/tmpfile",
      "/dup/d", "/other").map(p => (s"http://h$p", "h", p))
      .toDF("url", "host", "path")
    val got = Robots.allowed(pages, rules, "bot").collect()
      .map(r => r.getString(2) ->
        ((r.getBoolean(3), Option(r.getString(4))))).toMap
    assert(got == Map(
      "/private/x" -> ((false, Some("/private/"))),
      "/private/pub/y" -> ((true, Some("/private/pub/"))), // longest wins
      "/tmp/z" -> ((false, Some("/tmp"))),
      "/tmpfile" -> ((false, Some("/tmp"))), // mid-segment, as published
      "/dup/d" -> ((true, Some("/dup/"))),   // exact tie → Allow wins
      "/other" -> ((true, None))), got.toString)
  }

  test("allowed: control chars in a path strip before matching, so a " +
      "$-anchored rule evaluates identically under Java regex and the " +
      "oracle's RE2 (Java '$' also matches before a final newline)") {
    import SparkSpec.spark.implicits._
    val rules = Seq(
      ("h", "*", 0, "/private$"),
      ("h", "*", 0, "/tab/page")).toDF("host", "agent", "is_allow", "prefix")
    val pages = Seq(
      ("http://h/private%0A", "h", "/private\n"),   // NL-terminated path
      ("http://h/tab%09/page", "h", "/tab\t/page"), // embedded tab
      ("http://h/privateX", "h", "/privateX"))      // anchor still binds
      .toDF("url", "host", "path")
    val got = Robots.allowed(pages, rules, "bot").collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(got == Map(
      "http://h/private%0A" -> false, // stripped → exact match on anchor
      "http://h/tab%09/page" -> false,
      "http://h/privateX" -> true), got.toString)
    // and the ORIGINAL path column round-trips unmodified
    val paths = Robots.allowed(pages, rules, "bot").collect()
      .map(_.getString(2)).toSet
    assert(paths == Set("/private\n", "/tab\t/page", "/privateX"))
  }

  test("allowed: a specific-agent group shadows * entirely (its rules " +
      "do not merge in), and the crawler token folds case") {
    import SparkSpec.spark.implicits._
    val rules = Seq(
      ("h1", "graftbot", 0, "/graft-only/"),
      ("h1", "*", 0, "/"),             // must be IGNORED for graftbot
      ("h2", "*", 0, "/blocked/")).toDF("host", "agent", "is_allow", "prefix")
    val pages = Seq(
      ("http://h1/graft-only/a", "h1", "/graft-only/a"),
      ("http://h1/anything", "h1", "/anything"),
      ("http://h2/blocked/b", "h2", "/blocked/b"),
      ("http://h2/open", "h2", "/open")).toDF("url", "host", "path")
    val got = Robots.allowed(pages, rules, "GraftBot").collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(got == Map(
      "http://h1/graft-only/a" -> false,
      "http://h1/anything" -> true,    // the * Disallow: / is shadowed
      "http://h2/blocked/b" -> false,  // h2 has no specific group → *
      "http://h2/open" -> true), got.toString)
  }

  test("delays: binds to the preceding user-agent run, specific agent " +
      "beats *, several delays collapse to the minimum, non-integer " +
      "values and delay-less hosts drop") {
    import SparkSpec.spark.implicits._
    val robots = Seq(
      ("h1", Seq("User-agent: *", "Crawl-delay: 10",
        "User-agent: bot", "Crawl-delay: 3",
        "Crawl-delay: 7").mkString("\n")),      // bot: min(3,7)=3 beats *
      ("h2", Seq("User-agent: *", "Crawl-delay: 4").mkString("\n")),
      ("h3", Seq("User-agent: *", "Crawl-delay: soon").mkString("\n")),
      ("h4", Seq("User-agent: *", "Disallow: /x").mkString("\n")))
      .toDF("host", "body")
    val got = Robots.delays(robots, "Bot").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("h1" -> 3, "h2" -> 4), got.toString)
  }

  test("Sitemaps.entries: loc/lastmod extraction with whitespace trim, " +
      "loc-less entries drop, sitemapindex blocks are not urlset entries") {
    import SparkSpec.spark.implicits._
    val body = Seq(
      "<sitemapindex>",
      "  <sitemap><loc>http://h/sub.xml</loc></sitemap>", // index: ignored
      "</sitemapindex>",
      "<urlset>",
      "  <url>",
      "    <loc>  http://h/a  </loc>",
      "    <lastmod>  2026-01-01  </lastmod>",
      "  </url>",
      "  <url><loc>http://h/b</loc></url>",   // no lastmod → NULL
      "  <url><lastmod>2026-01-02</lastmod></url>", // no loc → dropped
      "</urlset>").mkString("\n")
    val got = Sitemaps.entries(Seq(("h", body)).toDF("host", "body"))
      .collect().map(r => r.getString(1) -> Option(r.getString(2))).toMap
    assert(got == Map(
      "http://h/a" -> Some("2026-01-01"),
      "http://h/b" -> None), got.toString)
  }

  test("allowed: RFC 9309 wildcards — * spans any run, trailing $ " +
      "anchors, interior $ and regex metachars stay literal, " +
      "specificity is raw pattern length") {
    import SparkSpec.spark.implicits._
    val rules = Seq(
      ("h", "*", 0, "/*.json$"),
      ("h", "*", 0, "/media/"),
      ("h", "*", 1, "/media/*.html"),
      ("h", "*", 0, "/a$b/"), // interior $ is literal
      ("h", "*", 0, "/p(1)/")) // parens are literal, not a regex group
      .toDF("host", "agent", "is_allow", "prefix")
    val paths = Seq("/data.json", "/deep/er/x.json", "/data.json.bak",
      "/media/x.html", "/media/x.html.tmp", "/media/y.png",
      "/a$b/z", "/ab/z", "/p(1)/q", "/p1/q")
    val pages = paths.map(p => (s"http://h$p", "h", p))
      .toDF("url", "host", "path")
    val got = Robots.allowed(pages, rules, "bot").collect()
      .map(r => r.getString(2) -> r.getBoolean(3)).toMap
    assert(got == Map(
      "/data.json" -> false,
      "/deep/er/x.json" -> false, // * spans multiple segments
      "/data.json.bak" -> true, // $ anchor holds
      "/media/x.html" -> true, // 13-char wildcard Allow beats /media/
      // the Allow pattern matches a PREFIX of this path too (no $), so
      // it still outranks the 7-char Disallow — the published rule
      "/media/x.html.tmp" -> true,
      "/media/y.png" -> false,
      "/a$b/z" -> false, "/ab/z" -> true, // $ literal mid-pattern
      "/p(1)/q" -> false, "/p1/q" -> true), got.toString)
  }

  test("wildcard pattern compilation equals an independent reference " +
      "matcher (randomized)") {
    // reference semantics straight from RFC 9309 §2.2.3, written
    // directly (recursive * matching), no regex anywhere
    def refMatch(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      // m(i, j): can body[j..] match path[i..] (prefix semantics: body
      // may end before the path unless anchored)
      def m(i: Int, j: Int): Boolean =
        if (j == body.length) !anchored || i == path.length
        else if (body.charAt(j) == '*')
          (i to path.length).exists(k => m(k, j + 1))
        else i < path.length && path.charAt(i) == body.charAt(j) &&
          m(i + 1, j + 1)
      m(0, 0)
    }
    import SparkSpec.spark.implicits._
    val rnd = new scala.util.Random(7)
    val chars = "ab/*.$()[x"
    val cases = (1 to 300).map { i =>
      val plen = 1 + rnd.nextInt(8)
      val pattern = "/" + Seq.fill(plen)(chars(rnd.nextInt(chars.length)))
        .mkString
      val path = "/" + Seq.fill(1 + rnd.nextInt(10))(
        chars.filter(c => c != '*')(rnd.nextInt(chars.length - 1)))
        .mkString
      (i.toLong, pattern, path)
    }
    // run every (pattern, path) pair through the ENGINE compiler: one
    // rule per case on its own host, one page per case on that host
    val rules = cases.map { case (i, p, _) => (s"h$i", "*", 0, p) }
      .toDF("host", "agent", "is_allow", "prefix")
    val pages = cases.map { case (i, _, path) =>
      (s"http://h$i$path", s"h$i", path) }.toDF("url", "host", "path")
    val got = Robots.allowed(pages, rules, "bot")
      .collect().map(r => r.getString(1) -> !r.getBoolean(3)).toMap
    cases.foreach { case (i, pattern, path) =>
      val want = refMatch(path, pattern) // matched Disallow → blocked
      assert(got(s"h$i") === want,
        s"pattern=$pattern path=$path want=$want")
    }
  }
}
