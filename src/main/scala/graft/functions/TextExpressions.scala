package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC/NFD/NFKC/
  * NFKD) — the text-canonicalization step every LLM corpus pipeline runs
  * before hashing/dedup (differently-composed strings must hash equal).
  *
  * Spark has no builtin for this; a Scala UDF would box every row and
  * fall out of whole-stage codegen. This expression stays codegen'd:
  * `doGenCode` emits a direct `java.text.Normalizer` call on the row's
  * string, so normalization composes with the surrounding per-row
  * expression pipeline (same extension tier as [[DotProductExpr]]).
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
  extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize expects a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression for Public-Suffix-List registrable-domain
  * extraction — the key the URL/domain corpus filters group on.
  *
  * The PSL rule sets ([[graft.llm.Psl]]) ship inside the jar and load
  * once per executor JVM, so the lookup needs no broadcast and no join;
  * a Scala UDF would box every row and break whole-stage codegen, while
  * this expression emits a direct static call (`Psl.registrable` — a
  * Scala object's static forwarder) and stays inside the codegen'd
  * per-row pipeline, exactly like [[UnicodeNormalizeExpr]].
  */
case class RegistrableDomainExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"registrable_domain expects a string host, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    graft.llm.Psl.registrable(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.llm.Psl.registrable($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression for RFC 3986 dot-segment removal
  * ([[graft.sources.Links]]' bounded step chain) — as inline
  * regexp_replace trees the 16-step chain, duplicated across the
  * link-resolution CASE's branches, exceeded Janino's method-size
  * limit and re-parsed every pattern per row. This node emits ONE
  * static call against per-JVM precompiled patterns
  * (`Links.removeDotSegments`), staying inside whole-stage codegen
  * exactly like [[RegistrableDomainExpr]]; semantics are
  * character-identical to the oracle's regexp_replace chain (same
  * patterns, same order, three runtimes). */
case class DotSegmentNormalizeExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot-segment normalize expects a string path, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    graft.sources.Links.removeDotSegments(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sources.Links.removeDotSegments($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression for hyperlink extraction + RFC 3986
  * resolution over one crawled page ([[graft.sources.Links]]): emits a
  * single static call against per-JVM precompiled patterns, returning
  * every `<a href>` occurrence as (base_url, href, anchor, link_url).
  * Why an expression and not built-in string functions: the equivalent
  * chain sits downstream of an explode, where Spark cannot split
  * oversized generated code (Janino method-size failure — pinned by
  * QueryPlanShapeSpec with codegen fallback disabled), and it re-scans
  * the page html once per regex; this node scans once per pattern and
  * keeps whole-stage codegen. Semantics are the oracle SQL chain's —
  * same patterns, same order. */
case class ExtractLinksExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      graft.sources.Links.LinkStructType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_links expects (url string, html string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(url: Any, html: Any): Any =
    graft.sources.Links.extractResolved(
      url.asInstanceOf[UTF8String], html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, h) =>
      s"${ev.value} = graft.sources.Links.extractResolved($u, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Longest-common-subsequence LENGTH between two token arrays — the
  * alignment kernel of ROUGE-L (Lin 2004). The classic O(n·m) DP with a
  * two-row rolling buffer, shipped as a native codegen'd expression for
  * the usual reason (a Scala UDF would box both arrays per row and break
  * whole-stage codegen); per-row work is partition-local, which is the
  * published cost of the metric. Element comparison is UTF8String
  * equality (null elements never match). */
case class LcsLenExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def ok(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_len expects array<string> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Lcs.lcsLen(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Lcs.lcsLen($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity between two strings — the record-linkage
  * standard verifier (Winkler 1990, on Jaro 1989; the metric the
  * merge/purge literature scores name candidates with). Native codegen'd
  * expression for the usual reason; semantics calibrated against DuckDB's
  * `jaro_winkler_similarity` so the oracle replays exactly (fuzzed on
  * 3000 random pairs at 1e-12): INTEGER transposition halving, 0.7 boost
  * threshold (strict >), prefix cap 4, scaling 0.1, either-empty → 0,
  * equal → 1. Comparison is by UTF-16 code unit (≡ codepoints on the
  * fixtures' ASCII; documented limit for astral-plane text). */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    Jaro.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Jaro.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel shared by interpreted eval and generated code. */
object Jaro {
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val w = math.max(0, math.max(l1, l2) / 2 - 1)
    val ma = new Array[Boolean](l1)
    val mb = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - w)
      val hi = math.min(l2 - 1, i + w)
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j0 = 0
    i = 0
    while (i < l1) {
      if (ma(i)) {
        while (!mb(j0)) j0 += 1
        if (a.charAt(i) != b.charAt(j0)) t += 1
        j0 += 1
      }
      i += 1
    }
    val tt = t / 2 // integer halving — the DuckDB-calibrated rule
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - tt) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      while (p < 4 && p < l1 && p < l2 && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Static DP kernel shared by interpreted eval and generated code. */
object Lcs {
  def lcsLen(a: org.apache.spark.sql.catalyst.util.ArrayData,
             b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        cur(j) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m).toLong
  }
}

/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * kernel of the published compression-ratio quality filter (documents
  * that compress far below the corpus norm are templated/repetitive
  * boilerplate; far above it, binary-ish noise). Native codegen'd
  * expression: per-row `java.util.zip.Deflater` at the FIXED level 6
  * with a thread-local reused instance (a Deflater holds native zlib
  * state — per-row allocation would dominate). Deterministic for a
  * given input on a given JVM's zlib; queries gate on widely-separated
  * THRESHOLD booleans, never raw lengths, so a zlib revision cannot
  * flip a verdict. */
case class DeflateLenExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects a string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    Deflate.deflateLen(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Deflate.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object Deflate {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }
  def deflateLen(s: UTF8String): Long = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object TextExpressions {
  import org.apache.spark.sql.graftshim.GraftColumn

  /** Column-level Unicode normalization. */
  def normalize(c: Column, form: String = "NFC"): Column =
    GraftColumn.column(UnicodeNormalizeExpr(GraftColumn.expression(c), form))

  /** Column-level PSL registrable-domain extraction. */
  def registrableDomain(c: Column): Column =
    GraftColumn.column(RegistrableDomainExpr(GraftColumn.expression(c)))

  /** Column-level RFC 3986 dot-segment removal (bounded step chain). */
  def dotSegmentNormalize(c: Column): Column =
    GraftColumn.column(DotSegmentNormalizeExpr(GraftColumn.expression(c)))

  /** Column-level hyperlink extraction + resolution:
    * (url, html) → array of (base_url, href, anchor, link_url). */
  def extractLinks(url: Column, html: Column): Column =
    GraftColumn.column(ExtractLinksExpr(
      GraftColumn.expression(url), GraftColumn.expression(html)))

  /** Column-level LCS length over two array<string> token columns. */
  def lcsLen(a: Column, b: Column): Column =
    GraftColumn.column(LcsLenExpr(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  /** Column-level Jaro-Winkler similarity (DuckDB-calibrated). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumn.column(JaroWinklerExpr(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  /** Column-level DEFLATE(level 6) byte length of a string's UTF-8. */
  def deflateLen(c: Column): Column =
    GraftColumn.column(DeflateLenExpr(GraftColumn.expression(c)))
}
