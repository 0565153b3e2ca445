package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 decoupled `Column` from Catalyst (`ColumnNode`); the classic
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — hence this one-file shim inside the sql
  * package, the standard pattern for libraries that ship custom
  * `Expression`s without requiring `SparkSessionExtensions` registration
  * (our sessions may be built by a driver we don't control, so a
  * config-free path matters). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
