package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve (the iterative rotate-and-reflect
  * formulation): maps a (x, y) cell of the 2^bits × 2^bits grid to its
  * position along the curve. Unlike the Morton interleave, CONSECUTIVE
  * curve positions are always 4-neighbors on the grid, which is exactly
  * the property that makes equal-width buckets of the sorted curve cover
  * compact, never-split rectangles — the better data-skipping layout for
  * range scans.
  *
  * The per-level loop is a plain static function so the Catalyst
  * expression's generated code can call it directly ([[HilbertIndexExpr]]
  * stays inside whole-stage codegen); the same function is the spec's
  * reference, and [[d2xy]] inverts it for the adjacency/bijectivity
  * properties.
  */
object Hilbert {

  /** Curve position of (x, y) on the 2^bits grid. Caller guarantees
    * 0 <= x, y < 2^bits (the Column wrapper raises in-plan). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the lower quadrant so the curve enters/exits correctly
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[xy2d]] — spec support for the bijectivity and
    * neighbor-adjacency properties. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column-level curve index (no range guard — see
    * [[ScaleJoins.hilbert2]] for the raising wrapper). */
  def index(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftColumn
    GraftColumn.column(HilbertIndexExpr(
      GraftColumn.expression(x.cast("long")),
      GraftColumn.expression(y.cast("long")), bits))
  }
}

/** Native codegen'd Hilbert index: the bit-level rotate/reflect loop as
  * nested Column `when`s would double the expression tree per level
  * (exponential in `bits`); one static call keeps the whole computation
  * inside whole-stage codegen, same tier as
  * [[graft.functions.UnicodeNormalizeExpr]]. */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert expects long inputs, got ${left.dataType.sql}, " +
        s"${right.dataType.sql}")

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) =>
      s"${ev.value} = graft.plans.Hilbert.xy2d($bits, $xc, $yc);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
