package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Table registry + schema introspection over a directory of parquet tables.
  *
  * Reference semantics: Glue catalog listing (`app/main.py:124-128`) and
  * per-table `[{Name, Type}]` schema introspection (`app/main.py:194`),
  * re-expressed as a path registry over `spark.read.parquet` with
  * metadata memoization (the reference cached these in Redis,
  * `app/main.py:119-129, 180-196`).
  *
  * Scale note: only *metadata* is cached here (schemas, distinct partition
  * values), never data. Reads go through the DataSource V2 vectorized
  * parquet reader, so column pruning / predicate pushdown stay intact.
  */
final class Catalog(spark: SparkSession, rootDir: String) {

  private val schemaCache = TrieMap.empty[String, Seq[(String, String)]]
  private val distinctCache = TrieMap.empty[(String, String), Seq[String]]

  /** Storage format per table: parquet (the native layout) or ORC — both
    * columnar V2 sources with vectorized scan + pushdown/pruning intact;
    * resolved by suffix under the root, parquet winning when both exist. */
  private def fmt(name: String): String =
    if (new java.io.File(s"$rootDir/$name.orc").exists() &&
        !new java.io.File(s"$rootDir/$name.parquet").exists()) "orc"
    else "parquet"

  def path(name: String): String = s"$rootDir/$name.${fmt(name)}"

  /** Lazy DataFrame over the named table. No caching of data: the scan must
    * stay a fresh logical leaf so Catalyst can push filters per-query.
    * Parquet goes through [[Tables.read]] so TIMESTAMP(NANOS) columns
    * (events.ts) load everywhere the catalog is used. */
  def table(name: String): DataFrame =
    if (fmt(name) == "orc") Tables.readOrc(spark, rootDir, name)
    else Tables.read(spark, rootDir, name)

  /** A9: enumerate queryable data types (parquet/orc files/dirs under root). */
  def listTables(): Seq[String] = {
    val dir = new java.io.File(rootDir)
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.getName.endsWith(".parquet") || f.getName.endsWith(".orc"))
      .map(_.getName.stripSuffix(".parquet").stripSuffix(".orc"))
      .distinct.sorted
  }

  /** A10: column names + SQL types, shaped like the reference's
    * `[{Name, Type}]` response. Memoized (metadata only). */
  def describe(name: String): Seq[(String, String)] =
    schemaCache.getOrElseUpdate(
      name,
      table(name).schema.fields.toSeq.map(f => (f.name, f.dataType.sql.toLowerCase))
    )

  /** `GET /filters/{data_type}` analog: distinct values of a filter-seeding
    * column (the reference's `SELECT DISTINCT species`, `app/main.py:185`),
    * cached forever after first hit like the reference. */
  def distinctValues(name: String, column: String): Seq[String] =
    distinctCache.getOrElseUpdate(
      (name, column),
      table(name).select(column).distinct().collect().map(r => String.valueOf(r.get(0))).toSeq.sorted
    )

  def exists(name: String): Boolean =
    new java.io.File(s"$rootDir/$name.parquet").exists() ||
      new java.io.File(s"$rootDir/$name.orc").exists()
}
