package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSessionShim

import graft.SparkSpec
import graft.functions.{TextExpressions, UnicodeNormalizeExpr}

/** Extension-tier wiring (SURVEY §2.b tier c): the optimizer rule
  * collapses redundant normalization, the extensions class contributes
  * rule + SQL functions, and the injected functions run the native
  * expression end-to-end on a live session. */
class GraftExtensionsSpec extends SparkSpec {

  private def countNormalize(df: org.apache.spark.sql.DataFrame): Int =
    CollapseNormalize(df.queryExecution.analyzed).expressions
      .flatMap(_.collect { case e: UnicodeNormalizeExpr => e }).length

  test("CollapseNormalize removes redundant passes, keeps distinct forms") {
    import SparkSpec.spark.implicits._
    val df = Seq("cafe\u0301").toDF("s")
    // nfc(nfc(x)) → one pass; nfc(nfkc(x)) → one pass (subsumed)
    assert(countNormalize(df.select(TextExpressions.normalize(
      TextExpressions.normalize(col("s"), "NFC"), "NFC"))) == 1)
    assert(countNormalize(df.select(TextExpressions.normalize(
      TextExpressions.normalize(col("s"), "NFKC"), "NFC"))) == 1)
    // nfkc(nfc(x)) is NOT redundant — both passes stay
    assert(countNormalize(df.select(TextExpressions.normalize(
      TextExpressions.normalize(col("s"), "NFC"), "NFKC"))) == 2)
  }

  test("GraftExtensions contributes the rule and both SQL functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftSessionShim.optimizerRules(ext, spark)
      .contains(CollapseNormalize))
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("normalize_nfc", "normalize_nfkc", "registrable_domain",
        "dot_segment_normalize", "extract_links", "lcs_len",
        "jaro_winkler", "deflate_len"))
  }

  test("injected SQL functions run the native expression on a live session") {
    GraftExtensions.functions.foreach(f =>
      GraftSessionShim.registerFunction(spark, f))
    val out = spark.sql("SELECT normalize_nfc('e\u0301') AS n, " +
      "normalize_nfkc('\ufb01le') AS k").head
    assert(out.getString(0) == "\u00e9")
    assert(out.getString(1) == "file")
    // the round-11 additions: PSL lookup, RFC 3986 dot-segment
    // removal, and hyperlink extraction all reachable from plain SQL
    val r2 = spark.sql(
      "SELECT registrable_domain('a.b.co.uk') AS d, " +
        "dot_segment_normalize('/a/b/../c') AS p, " +
        "size(extract_links('http://h.ex/d/', " +
        "'<a href=\"x\">t</a>')) AS n").head
    assert(r2.getString(0) == "b.co.uk")
    assert(r2.getString(1) == "/a/c")
    assert(r2.getInt(2) == 1)
    // round-12: the ROUGE-L alignment kernel from plain SQL
    val r3 = spark.sql(
      "SELECT lcs_len(array('a','b','c','d','e')," +
        " array('b','a','d','c','e')) AS l").head
    assert(r3.getLong(0) == 3L)
    // round-12: the record-linkage verifier — canonical Winkler values
    val r4 = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS a, " +
        "jaro_winkler('dixon', 'dicksonx') AS b, " +
        "jaro_winkler('abqqqqqq', 'abzzzz') AS c, " + // below boost bar
        "jaro_winkler('', '') AS d").head             // DuckDB edge: 0
    assert(math.abs(r4.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(r4.getDouble(1) - 0.8133333333333332) < 1e-12)
    assert(math.abs(r4.getDouble(2) - 0.5277777777777778) < 1e-12)
    assert(r4.getDouble(3) == 0.0)
    // round-13: the compression-signal kernel from plain SQL — a
    // 400-char single-symbol run must deflate far below a fifth of an
    // equal-length md5-hex chain (bar ordering, never exact lengths)
    val r5 = spark.sql(
      "SELECT deflate_len(repeat('a', 400)) AS rep, " +
        "deflate_len(concat(md5('1'), md5('2'), md5('3'), md5('4'), " +
        "md5('5'), md5('6'), md5('7'), md5('8'), md5('9'), md5('10'), " +
        "md5('11'), md5('12'))) AS rnd").head
    assert(r5.getLong(0) * 5 < r5.getLong(1),
      s"deflate separation broke: ${r5.getLong(0)} vs ${r5.getLong(1)}")
  }
}
