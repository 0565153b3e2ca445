package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.export.{ExportService, Exporters}

/** The engine facade — everything a user of the reference service could
  * do, as one object (reference endpoints → methods):
  *
  * {{{
  * val g = Graft(spark, dataDir = "/data/tables", workDir = "/work")
  * g.tables()                                  // GET /data_types
  * g.schema("gene")                            // GET /data_types/gene/schema
  * g.filterValues("gene", "species")           // GET /filters/gene
  * val id = g.submit("gene", "species", "homo_sapiens",
  *   fields = "gene_id, gene_stable_id",
  *   condition = Some("gene_id = 554"))        // GET /query/...
  * g.status(id)                                // GET /query/{id}/status
  * g.preview(id)                               // GET /query/{id}/preview
  * g.export(id, "xlsx")                        // GET /query/{id}/export
  * }}}
  *
  * plus the Layer-C analytics surface via [[sql]]/[[table]] for arbitrary
  * DataFrame work (the capability Athena had but the reference's API
  * never parameterized).
  */
final class Graft(
    val spark: SparkSession,
    dataDir: String,
    workDir: String,
    partitionColumn: String = "species"
) extends AutoCloseable {

  val catalog = new Catalog(spark, dataDir)
  val queries = new QueryService(spark, catalog, s"$workDir/results")
  val exports = new ExportService(spark, id => s"$workDir/results/$id", s"$workDir/exports")

  /** A9: queryable tables. */
  def tables(): Seq[String] = catalog.listTables()

  /** A10: `[(name, sqlType)]` column listing. */
  def schema(table: String): Seq[(String, String)] = catalog.describe(table)

  /** Filter seeding (`GET /filters/{t}`): distinct values, cached. */
  def filterValues(table: String, column: String): Seq[String] =
    catalog.distinctValues(table, column)

  /** Supported export formats (`GET /formats`). */
  def formats(): Seq[String] = Exporters.SupportedFormats

  /** Submit the reference query shape; async-by-id. */
  def submit(table: String, partitionCol: String, partitionValue: String,
             fields: String = "*", condition: Option[String] = None): String =
    queries.submit(table, partitionCol, partitionValue, fields, condition)

  /** Submit with the configured default partition column. */
  def submit(table: String, partitionValue: String, fields: String,
             condition: Option[String]): String =
    queries.submit(table, partitionColumn, partitionValue, fields, condition)

  /** HAL `_links` for a submitted query (reference `app/main.py:492-500`):
    * the follow-up hrefs a client can take from a submit response. */
  def links(queryId: String): Map[String, String] = queries.links(queryId)

  def status(queryId: String): Option[QueryService.Status] = queries.status(queryId)
  def cancel(queryId: String): Boolean = queries.cancel(queryId)
  def preview(queryId: String, maxResults: Int = 26): Either[String, Seq[Seq[String]]] =
    queries.preview(queryId, maxResults)
  def awaitQuery(queryId: String): QueryService.State = queries.await(queryId)

  def export(queryId: String, format: String): ExportService.State =
    exports.export(queryId, format)
  def awaitExport(queryId: String, format: String): ExportService.State =
    exports.await(queryId, format)

  /** Full analytics surface: a table as a DataFrame... */
  def table(name: String): DataFrame = catalog.table(name)

  /** ...or arbitrary SQL over the registered tables, with the engine's
    * native functions (vec_dot/cosine_sim/array_eq_count) in scope. */
  def sql(query: String): DataFrame = {
    graft.functions.VecFunctions.registerSqlFunctions(spark)
    graft.functions.PrestoCompat.register(spark)
    tables().foreach(t => catalog.table(t).createOrReplaceTempView(t))
    spark.sql(query)
  }

  def close(): Unit = { queries.close(); exports.close() }
}

object Graft {
  def apply(spark: SparkSession, dataDir: String, workDir: String,
            partitionColumn: String = "species"): Graft =
    new Graft(spark, dataDir, workDir, partitionColumn)
}
