package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Builds the reference's one query shape as a declarative Spark plan.
  *
  * Reference: `SELECT {fields} FROM {data_type} WHERE species='{species}'
  * AND {condition};` assembled by string interpolation (`app/main.py:477-479`).
  * Here the same surface becomes `table.filter(col === lit).filter(expr)
  * .selectExpr(fields)` — Catalyst parses `condition`/`fields` (the full SQL
  * expression grammar the reference reached through Presto, SURVEY.md §2 B7),
  * and the mandatory equality is a separate `Column` comparison so the
  * partition-key value is never spliced into SQL text (injection-safe, and
  * partition-prunable when the layout is partitioned by that column).
  *
  * Scale: project+filter stay fully declarative, so predicate pushdown and
  * column pruning reach the parquet scan (verify with
  * `df.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object QueryBuilder {

  /** The reference's canonical query shape (B1–B4, B7).
    *
    * @param partitionColumn the mandatory-filter column ("species" analog)
    * @param partitionValue  its required value
    * @param fields    comma-separated projection, "*" = all (B2)
    * @param condition optional SQL boolean expression, appended conjunctively (B4/B7)
    */
  def build(
      table: DataFrame,
      partitionColumn: String,
      partitionValue: String,
      fields: String = "*",
      condition: Option[String] = None
  ): DataFrame = {
    val filtered = table.filter(col(partitionColumn) === lit(partitionValue))
    val conditioned = condition.filter(_.trim.nonEmpty) match {
      case Some(c) => filtered.filter(expr(rewrite(c)))
      case None    => filtered
    }
    project(conditioned, fields)
  }

  /** Generic (no mandatory partition filter) scan→filter→project. */
  def select(table: DataFrame, fields: String, condition: Option[String]): DataFrame = {
    val conditioned = condition.filter(_.trim.nonEmpty) match {
      case Some(c) => table.filter(expr(rewrite(c)))
      case None    => table
    }
    project(conditioned, fields)
  }

  // conditions/fields arrive in the reference's dialect (Presto);
  // parser-level deltas can't be shimmed through the function registry,
  // so the raw fragment is rewritten before Catalyst sees it (B7)
  private def rewrite(sql: String): String =
    graft.functions.PrestoCompat.rewriteDialect(sql)

  private def project(df: DataFrame, fields: String): DataFrame =
    fields.trim match {
      case "" | "*" => df
      case fs       => df.selectExpr(splitTopLevel(rewrite(fs)): _*)
    }

  /** Split the projection list on top-level commas only — `fields` is a
    * verbatim SQL fragment in the reference (`app/main.py:479`), so
    * `round(b, 2) AS x, a` must become two expressions, not three. Tracks
    * paren depth and single-quote strings ('' = escaped quote). */
  private[engine] def splitTopLevel(fields: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < fields.length) {
      val c = fields.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\'') inStr = false
      } else c match {
        case '\'' => inStr = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** B5: DISTINCT column values (the reference's filter-seeding query). */
  def distinct(table: DataFrame, column: String): DataFrame =
    table.select(column).distinct()

  /** B6: LIMIT — plans as CollectLimitExec, no full scan. */
  def limit(df: DataFrame, n: Int): DataFrame = df.limit(n)
}
