package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft can register
  * custom Catalyst expressions as Columns. Lives under
  * org.apache.spark.sql.* purely for access; no Spark code is modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `org.apache.spark.sql.types.AbstractDataType` is private[sql];
    * re-exported here so expressions can declare `inputTypes`. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
