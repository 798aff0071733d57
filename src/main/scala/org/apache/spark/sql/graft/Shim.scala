package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to the `private[sql]` Column <-> Expression converters.
 * Spark 4 moved Column to a ColumnNode representation; building a Column
 * from a raw Catalyst Expression (needed to expose our custom codegen'd
 * expressions through the public Column API) requires
 * `org.apache.spark.sql.classic.ExpressionUtils`, which is package-private.
 * This shim is the only code living in the Spark namespace.
 */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
