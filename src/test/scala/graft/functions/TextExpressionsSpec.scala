package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UnicodeNormalizeExpr: composition semantics on interpreted and codegen
  * paths, null propagation, form validation. Inputs use explicit escapes
  * (́ COMBINING ACUTE, ﬁ LIGATURE FI) so the fixtures are
  * visibly decomposed/compatibility forms. */
class TextExpressionsSpec extends SparkSpec {

  test("NFC composes decomposed sequences (codegen path over a table)") {
    import SparkSpec.spark.implicits._
    val df = Seq((1L, "cafe\u0301"), (2L, "plain"), (3L, null: String))
      .toDF("id", "s")
    val out = df.select(col("id"),
        TextExpressions.normalize(col("s"), "NFC").as("n"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) == "caf\u00e9") // e + U+0301 → é
    assert(out(1).getString(1) == "plain")
    assert(out(2).isNullAt(1))
  }

  test("NFKC folds compatibility characters") {
    import SparkSpec.spark.implicits._
    val df = Seq(Tuple1("\ufb01le")).toDF("s") // LIGATURE FI + "le"
    val nfkc = df.select(TextExpressions.normalize(col("s"), "NFKC"))
      .head.getString(0)
    val nfc = df.select(TextExpressions.normalize(col("s"), "NFC"))
      .head.getString(0)
    assert(nfkc == "file")
    assert(nfc == "\ufb01le") // NFC keeps compatibility chars
  }

  test("interpreted eval agrees with codegen") {
    val e = UnicodeNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("e\u0301"), "NFC")
    assert(e.eval(null).toString == "\u00e9")
  }

  test("rejects unknown forms and non-string input") {
    intercept[IllegalArgumentException] {
      UnicodeNormalizeExpr(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
    val bad = UnicodeNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(1), "NFC")
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
