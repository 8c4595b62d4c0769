package graft.llm

import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List parsing + registrable-domain lookup.
  *
  * The bundled `graft/public_suffix_list.dat` resource is the COMPLETE
  * published publicsuffix.org list, verbatim (~9.5k rules incl. the
  * private section and IDN U-label rules), in the canonical grammar —
  * one rule per line, `//` comments, `*.` wildcard rules, `!`
  * exception rules; the parser and lookup are data-independent, so a
  * list refresh is a resource swap. Lookup follows the published
  * algorithm:
  *
  *   1. a rule matches a host when the rule equals a label-suffix of
  *      the host; a wildcard rule `*.foo` matches any suffix with
  *      exactly one extra label before `foo`;
  *   2. an EXCEPTION rule (`!www.ck`) beats every other match and its
  *      public suffix is the rule minus its leading label;
  *   3. otherwise the LONGEST matching rule prevails;
  *   4. no rule at all → the implicit `*` rule (the bare TLD is the
  *      public suffix);
  *   5. registrable domain = public suffix + one more label.
  *
  * One documented divergence: a host that IS a public suffix (or a
  * single label) has no registrable domain under the spec; this engine
  * returns the host itself — an empty/null key would silently pool
  * unrelated rows under one blocklist/per-domain-cap key (see
  * [[Domains.registrableDomain]]).
  *
  * Scale shape: the parsed rule sets ship inside the application jar
  * and load once per executor JVM (a few hundred KB even for the full
  * ~10k-rule list — no broadcast, no join); lookup is bounded label
  * arithmetic per row, invoked from the codegen'd
  * [[graft.functions.RegistrableDomainExpr]].
  *
  * Reference anchor: repype/stage.py:324-351 (stage behavior driven by
  * configured data, not code).
  */
object Psl {

  /** Parsed rule sets. `wildcardBases` holds `foo` for a `*.foo` rule;
    * `exceptions` holds `www.ck` for `!www.ck`. `maxLabels` bounds the
    * suffix walk (longest rule in label count, +1 for wildcards). */
  final case class Rules(exact: Set[String], wildcardBases: Set[String],
                         exceptions: Set[String], maxLabels: Int)

  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    var maxL = 1
    def labelCount(s: String): Int = s.count(_ == '.') + 1
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .foreach { line =>
        // per the PSL spec, the rule is everything up to the first
        // whitespace; rules compare case-insensitively
        val r = line.split("\\s+")(0).toLowerCase
        if (r.startsWith("!")) {
          val b = r.substring(1)
          exc += b
          maxL = maxL.max(labelCount(b))
        } else if (r.startsWith("*.")) {
          val b = r.substring(2)
          wild += b
          maxL = maxL.max(labelCount(b) + 1)
        } else {
          exact += r
          maxL = maxL.max(labelCount(r))
        }
      }
    Rules(exact.result(), wild.result(), exc.result(), maxL)
  }

  /** Bundled rules, loaded once per JVM. */
  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled graft/public_suffix_list.dat missing")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Label count of the public suffix of `labels` (a host split on
    * '.'), per the publicsuffix.org algorithm. 0 only when an
    * exception rule IS a TLD (never in practice). */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val r = rules
    val k = labels.length
    var best = 1 // the implicit "*" rule: unknown TLD is a public suffix
    var len = 1
    var suffix = labels(k - 1)
    val bound = math.min(k, r.maxLabels)
    while (len <= bound) {
      // exception beats every other match, immediately
      if (r.exceptions.contains(suffix)) return len - 1
      if (r.exact.contains(suffix)) best = math.max(best, len)
      if (len >= 2) {
        // `*.base` matches a suffix with exactly one label before base
        val parent = suffix.substring(suffix.indexOf('.') + 1)
        if (r.wildcardBases.contains(parent)) best = math.max(best, len)
      }
      len += 1
      if (len <= bound) suffix = labels(k - len) + "." + suffix
    }
    best
  }

  /** Registrable domain of an already-normalized (lowercase, no port)
    * host. Called from codegen via the static forwarder — keep the
    * signature UTF8String → UTF8String. */
  def registrable(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    val labels = h.split('.')
    val k = labels.length
    if (k <= 1 || labels.exists(_.isEmpty)) return host
    val ps = publicSuffixLabels(labels)
    if (ps >= k) host // the host IS a public suffix: its own key
    else {
      val sb = new java.lang.StringBuilder
      var i = k - ps - 1
      while (i < k) {
        if (i > k - ps - 1) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** The same rule table as a DuckDB VALUES list — `(rule, kind)` with
    * kind 0 = exact, 1 = wildcard base, 2 = exception — so oracle SQL
    * pins the IDENTICAL suffix data the engine looks up, not a
    * hand-copied subset. Deterministic order for stable SQL text. */
  def oracleValuesSql: String = {
    val r = rules
    val rows =
      r.exact.toSeq.sorted.map(s => s"('$s', 0)") ++
        r.wildcardBases.toSeq.sorted.map(s => s"('$s', 1)") ++
        r.exceptions.toSeq.sorted.map(s => s"('$s', 2)")
    rows.mkString(", ")
  }
}
