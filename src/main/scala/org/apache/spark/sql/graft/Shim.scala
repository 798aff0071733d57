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

/**
 * Analysis-time input-type enforcement for expressions living outside the
 * Spark namespace: `ExpectsInputTypes.inputTypes` wants
 * `Seq[AbstractDataType]`, but `AbstractDataType` is `private[sql]` in
 * Spark 4 — this trait narrows the contract to concrete (public)
 * `DataType`s so graft expressions declare their types and misuse fails at
 * analysis (clear error naming the function) instead of a runtime
 * ClassCastException inside codegen.
 */
trait GraftInputTypes extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  /** Concrete expected input types, one per child. */
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    graftInputTypes
}
