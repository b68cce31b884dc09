package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ↔ Expression bridge. Spark 4 made the classic
  * converters `private[sql]`; custom Catalyst expressions still need
  * them to surface as `Column`s, so this one-file shim lives inside the
  * sql package tree. No other Spark internals are touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
