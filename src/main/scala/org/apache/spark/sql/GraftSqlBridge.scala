package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst
  * expressions. Spark 4 made the Column API implementation-agnostic
  * and the classic converters `private[sql]`; this shim re-exports
  * exactly the two conversions a library-defined `Expression` needs
  * to participate in the public Column API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
