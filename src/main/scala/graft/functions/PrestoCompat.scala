package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, StringInstr}
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.sql.graft.ColumnShim

/** Presto-dialect aliases for the reference's `condition` pass-through
  * (SURVEY.md §2 B7): the reference forwarded raw SQL fragments to
  * Athena/Presto, so conditions written against it may use Presto
  * function names. Spark covers most (`cardinality` is already a native
  * alias of size); the missing trio is registered here. `date_diff` is
  * deliberately NOT shimmed: Spark 4 ships a 2-arg `date_diff(end,
  * start)` builtin, and shadowing it with Presto's 3-arg form would
  * silently change native queries — callers use `timestampdiff(unit, s,
  * e)`, the documented delta. */
object PrestoCompat {

  def register(spark: SparkSession): Unit = {
    // strpos(string, substring) -> 1-based position, 0 if absent
    ColumnShim.registerFunction(spark, "strpos",
      args => StringInstr(args(0), args(1)))
    // json_extract_scalar(json, path) -> string
    ColumnShim.registerFunction(spark, "json_extract_scalar",
      args => GetJsonObject(args(0), args(1)))
    // approx_distinct(x) -> HLL++ estimate
    ColumnShim.registerFunction(spark, "approx_distinct",
      args => HyperLogLogPlusPlus(args.head).toAggregateExpression())
  }
}
