package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for Spark's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 made `Column` node-backed and hid the classic expression bridge
  * behind `private[sql]`; placing this shim inside the `org.apache.spark.sql`
  * package tree is the standard way third-party Catalyst extensions (custom
  * expressions exposed as `Column` functions) reach it.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
