package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Column <-> Expression conversions are private[sql]
  * in Spark 4, and third-party native expressions need them (the same
  * pattern frameless/spark-daria use). Nothing else from the private API
  * surface is touched. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
