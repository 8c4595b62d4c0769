package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 ↔ engine parity (VERDICT r12 item 6): the coverage
  * denominator is machine-checked, not judge-adjudicated prose.
  *
  *  - Appendix A lists every registered query, one line each; this
  *    spec pins EXACT set equality with `SparkEntry.queries`, so a new
  *    operator without an appendix line (or a stale line after a
  *    rename) fails the build. Regenerate with
  *    `sbt "runMain graft.tools.QueryNames"`.
  *  - Every §2 table row must carry at least one piece of RESOLVABLE
  *    evidence: a registered `q_*` query name, a ScalaTest suite that
  *    exists under src/test, or a source file that exists under
  *    src/main — so a row can't claim coverage with a dangling name.
  */
class SurveyParitySpec extends AnyFunSuite {

  private lazy val survey: Vector[String] = {
    val src = scala.io.Source.fromFile("SURVEY.md")("UTF-8")
    try src.getLines().toVector finally src.close()
  }

  private lazy val registered: Set[String] = SparkEntry.queries.keySet

  private def section(from: String, until: String): Vector[String] = {
    val s = survey.indexWhere(_.startsWith(from))
    val e = survey.indexWhere(_.startsWith(until), s + 1)
    assert(s >= 0, s"marker not found: $from")
    survey.slice(s, if (e < 0) survey.length else e)
  }

  test("Appendix A is exactly the registered query set") {
    val listed = section("## Appendix A", "## ")
      .flatMap("""^- `(q[a-z0-9_]+)`$""".r.findFirstMatchIn(_))
      .map(_.group(1)).toSet
    val missing = registered -- listed
    val stale = listed -- registered
    assert(missing.isEmpty,
      s"queries missing from Appendix A (regenerate): ${missing.toSeq.sorted}")
    assert(stale.isEmpty,
      s"stale Appendix A entries: ${stale.toSeq.sorted}")
  }

  test("every §2 table row names a registered query, an existing " +
    "suite, or an existing source file") {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) walk(f) else Seq(f))
    def declared(root: String): Set[String] =
      walk(new java.io.File(root))
        .filter(_.getName.endsWith(".scala"))
        .flatMap { f =>
          val src = scala.io.Source.fromFile(f)("UTF-8")
          try """(?m)^\s*(?:class|object|trait)\s+(\w+)""".r
            .findAllMatchIn(src.mkString).map(_.group(1)).toVector
          finally src.close()
        }.toSet
    // suites may live inside another file; index class/object names
    val suiteNames: Set[String] = declared("src/test/scala")
    // engine API references (`Dedup.compactMinhashIndex`, `core/Metrics`)
    // resolve against names DECLARED in main sources — a renamed or
    // deleted object leaves the row dangling and fails here
    val mainNames: Set[String] = declared("src/main/scala")
    val mainFileNames: Set[String] =
      walk(new java.io.File("src/main/scala")).map(_.getName).toSet
    def fileExists(p: String): Boolean = {
      val base = new java.io.File("src/main/scala/graft")
      new java.io.File(base, p).exists() ||
        new java.io.File(base, p.stripPrefix("graft/")).exists() ||
        new java.io.File("src/test/scala/graft", p).exists() ||
        mainFileNames(p.split("/").last)
    }
    // Appendix B supplies evidence for the §2.a/§2.b rows whose tables
    // cite reference sources / Spark primitives instead (row key ::
    // evidence tokens)
    val appendixB: Map[String, String] = section("## Appendix B", "## ")
      .flatMap("""^- (.+?) :: (.+)$""".r.findFirstMatchIn(_))
      .map(m => m.group(1).trim -> m.group(2)).toMap
    def resolves(text: String): Boolean = {
      val qs = """q[a-z0-9_]+""".r.findAllIn(text).toSeq
      val specs = """[A-Z]\w*(?:Spec|Props)""".r.findAllIn(text).toSeq
      val files = """[\w/]+\.scala""".r.findAllIn(text).toSeq
      val decls = """[A-Z][A-Za-z0-9]+""".r.findAllIn(text).toSeq
      val examples = """examples/[\w*{]+""".r.findAllIn(text).toSeq
        .map(_.replaceAll("[*{].*", "").stripSuffix("/"))
      qs.exists(registered) || specs.exists(suiteNames) ||
        files.exists(fileExists) || decls.exists(mainNames) ||
        examples.exists(e => new java.io.File(e).exists())
    }
    val header =
      """^\|\s*(#|Component|Operator|Op|Family|query|Extension)\s*\|""".r
    val rows = section("## 2. Operator inventory", "## 3.")
      .filter(_.startsWith("|"))
      .filterNot(_.startsWith("|---"))
      .filterNot(l => header.findFirstIn(l).isDefined)
    assert(rows.size >= 400, s"§2 table shrank to ${rows.size} rows?")
    val bad = rows.filterNot { row =>
      val first = row.split("\\|")(1).trim.stripPrefix("`").stripSuffix("`")
      resolves(row) || appendixB.get(first).exists(resolves)
    }
    assert(bad.isEmpty,
      s"§2 rows with no resolvable evidence (${bad.size}):\n" +
        bad.map(_.take(140)).mkString("\n"))
    // and every Appendix B token itself resolves (no dangling evidence)
    val deadEv = appendixB.filterNot { case (_, ev) => resolves(ev) }
    assert(deadEv.isEmpty, s"Appendix B dangling evidence: $deadEv")
  }
}
