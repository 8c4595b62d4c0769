package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

/** `private[sql]` session access for extension wiring (companion of
  * [[GraftColumn]]): register an injected function on a LIVE session's
  * registry, and probe what a `SparkSessionExtensions` instance would
  * contribute — lets specs verify extension classes without tearing down
  * and rebuilding the shared test session (Spark 4's builder refuses to
  * attach extensions to an existing session).
  */
object GraftSessionShim {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Register a SQL function on an existing session (what
    * `injectFunction` does at session-build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       fn: FunctionDescription): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)

  /** The optimizer rules an extensions instance would inject. */
  def optimizerRules(ext: SparkSessionExtensions,
                     spark: org.apache.spark.sql.SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark.asInstanceOf[SparkSession])
}
