package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.UnicodeNormalizeExpr

/** Catalyst optimizer rule: collapse redundant Unicode normalization.
  *
  * Normalization is idempotent (`nfc(nfc(x)) = nfc(x)`), and a
  * compatibility normalization subsumes its canonical counterpart
  * (NFKC output is NFC-normalized by definition, NFKD output is
  * NFD-normalized). Pipelines compose normalization freely — a cleaning
  * stage normalizes, then a dedup stage normalizes again defensively —
  * and this rule removes the duplicate pass over every row's string.
  */
object CollapseNormalize extends Rule[LogicalPlan] {
  private def subsumes(inner: String, outer: String): Boolean =
    inner == outer ||
      (inner == "NFKC" && outer == "NFC") ||
      (inner == "NFKD" && outer == "NFD")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalizeExpr(inner @ UnicodeNormalizeExpr(_, f1), f2)
          if subsumes(f1, f2) => inner
    }
}

/** Session extensions — the SURVEY §2.b extension tier (c) surface:
  * registered via `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`), this injects
  *   - the [[CollapseNormalize]] optimizer rule, and
  *   - SQL functions `normalize_nfc` / `normalize_nfkc` backed by the
  *     native codegen'd [[UnicodeNormalizeExpr]], so SQL-only users get
  *     the same expression the DataFrame API exposes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CollapseNormalize)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private def fn(name: String, form: String) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects exactly one argument")
      UnicodeNormalizeExpr(args.head, form): Expression
    })

  /** The injected SQL function surface (also registrable on a live
    * session via `GraftSessionShim.registerFunction`). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq(fn("normalize_nfc", "NFC"), fn("normalize_nfkc", "NFKC"),
      (new FunctionIdentifier("registrable_domain"),
        new ExpressionInfo(
          classOf[graft.functions.RegistrableDomainExpr].getName,
          "registrable_domain"),
        (args: Seq[Expression]) => {
          require(args.length == 1,
            "registrable_domain expects exactly one argument")
          graft.functions.RegistrableDomainExpr(args.head): Expression
        }),
      (new FunctionIdentifier("dot_segment_normalize"),
        new ExpressionInfo(
          classOf[graft.functions.DotSegmentNormalizeExpr].getName,
          "dot_segment_normalize"),
        (args: Seq[Expression]) => {
          require(args.length == 1,
            "dot_segment_normalize expects exactly one argument")
          graft.functions.DotSegmentNormalizeExpr(args.head): Expression
        }),
      (new FunctionIdentifier("extract_links"),
        new ExpressionInfo(
          classOf[graft.functions.ExtractLinksExpr].getName,
          "extract_links"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "extract_links expects (url, html)")
          graft.functions.ExtractLinksExpr(args(0), args(1)): Expression
        }),
      (new FunctionIdentifier("lcs_len"),
        new ExpressionInfo(
          classOf[graft.functions.LcsLenExpr].getName, "lcs_len"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "lcs_len expects (array<string>, array<string>)")
          graft.functions.LcsLenExpr(args(0), args(1)): Expression
        }),
      (new FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(
          classOf[graft.functions.JaroWinklerExpr].getName,
          "jaro_winkler"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "jaro_winkler expects (string, string)")
          graft.functions.JaroWinklerExpr(args(0), args(1)): Expression
        }),
      (new FunctionIdentifier("deflate_len"),
        new ExpressionInfo(
          classOf[graft.functions.DeflateLenExpr].getName,
          "deflate_len"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "deflate_len expects (string)")
          graft.functions.DeflateLenExpr(args(0)): Expression
        }))
}
