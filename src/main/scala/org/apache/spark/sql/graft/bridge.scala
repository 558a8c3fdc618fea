/*
 * Bridge into spark-sql package-private helpers. Lives in the
 * org.apache.spark.sql namespace solely to reach `private[sql]`
 * Column<->Expression converters; no Spark internals are modified.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
