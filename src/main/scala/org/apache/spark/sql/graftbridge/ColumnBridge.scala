package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This two-method
  * bridge lives in the sql package namespace solely to let the engine
  * expose its native Catalyst expressions (e.g.
  * `graft.extract.ExtractMainText`) as Columns — the standard shim for
  * libraries shipping custom expressions against the classic API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
