package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the conversion
  * `private[sql]` (Column is a thin ColumnNode wrapper in sql-api); an
  * extension library that ships native Catalyst expressions needs this
  * one-file shim in an `org.apache.spark.sql` subpackage — the same
  * pattern GraphFrames and Delta use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
