package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the `private[sql]` session function registry — the
  * post-session-construction counterpart of `SparkSessionExtensions
  * .injectFunction` for sessions that already exist (REPL, notebook, a
  * shared test session). Kept to the one registration call and nothing
  * else; the supported build-time path stays `GraftExtensions` via
  * `.withExtensions` / `spark.sql.extensions`. */
object GraftFunctionBridge {
  def register(
      spark: SparkSession,
      ident: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
