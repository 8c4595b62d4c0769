package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst expressions and the public Column API.
  *
  * Spark 4 made Column expression-agnostic; the Expression↔Column
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * scoped `private[sql]` — the supported pattern for third-party native
  * expressions is a shim inside the `org.apache.spark.sql` namespace
  * (same trick every expression-library ecosystem uses). This is the only
  * file in the repo that reaches into Spark-private scope.
  */
object GraftColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
