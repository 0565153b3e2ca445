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

  /** Current session/task ANSI flag — `SQLConf` is `private[sql]`; the
    * decimal expressions need it to replicate the Cast error-vs-null
    * contract on their rare slow paths (driver AND executor: SQLConf.get
    * reads the task-local conf inside tasks). */
  def ansiEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  /** Register a temp SQL function backed by a Catalyst expression builder
    * (so `spark.sql("SELECT cosine_sim(a, b) ...")` works without
    * SparkSessionExtensions — the registry is session state, also
    * `private[sql]`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
