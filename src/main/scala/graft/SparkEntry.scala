package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryDefs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical query shape (scan → mandatory filter →
    * condition → projection, reference app/main.py:479). */
  def entry(spark: SparkSession): DataFrame =
    QueryDefs.byName("b1_scan_filter_project").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDefs.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDefs.all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap
}
