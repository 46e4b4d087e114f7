package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives under
  * `org.apache.spark.sql` solely for access; the graft-facing surface
  * is [[graft.functions.Native]]. This is the established pattern for
  * libraries that ship native Catalyst expressions against Spark 4's
  * ColumnNode API (no public constructor takes an Expression).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
