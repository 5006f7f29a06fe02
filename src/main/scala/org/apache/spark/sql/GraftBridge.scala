package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column↔Expression bridge for graft's custom Catalyst expressions.
  * `ExpressionUtils` is private[sql] in Spark 4's classic module, so the
  * usual extension-library pattern applies: a minimal adapter compiled
  * into the org.apache.spark.sql package. Only these two conversions are
  * used — no other internals are touched.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
