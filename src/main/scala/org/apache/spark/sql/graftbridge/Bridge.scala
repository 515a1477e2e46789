package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 moved `Column` onto the connect-compatible ColumnNode API and
  * made the catalyst-Expression constructor `private[sql]`; libraries
  * that ship custom expressions (as we do for the hot-loop kernels in
  * `graft.functions.expressions`) reach it from inside the sql package
  * namespace — the same approach used by open-source Spark extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
