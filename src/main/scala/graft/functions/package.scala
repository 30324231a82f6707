package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Bridges between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made `Column` node-backed; the classic-mode conversion lives
  * behind `private[sql]`, reached via [[Bridge]].
  */
package object functions {
  private[graft] def toCol(e: Expression): Column = Bridge.column(e)
  private[graft] def toExpr(c: Column): Expression = Bridge.expression(c)
}
